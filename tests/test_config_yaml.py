"""S9 YAML config round-trip: the shipped config files must load EQUAL to
the in-plan literal tables (so the YAML and the query plans cannot drift),
and the emitter must round-trip (NB03 write_yaml ↔ 04…ipynb safe_load)."""

from __future__ import annotations

import yaml

from hdx_metadata_crawler_spark.plans.queries_text import (
    ORG_HINTS,
    OVERRIDES,
    TAG_WEIGHTS,
)
from hdx_metadata_crawler_spark.sources.config import (
    dump_tag_weights,
    load_org_hints,
    load_overrides,
    load_tag_weights,
)

CONFIG_DIR = "/root/repo/config"


def test_tag_weights_yaml_matches_literals():
    assert load_tag_weights(f"{CONFIG_DIR}/tag_to_component.yaml") == sorted(
        TAG_WEIGHTS
    )


def test_org_hints_yaml_matches_literals():
    assert load_org_hints(f"{CONFIG_DIR}/org_hints.yaml") == sorted(ORG_HINTS)


def test_overrides_yaml_matches_literals():
    assert load_overrides(f"{CONFIG_DIR}/overrides.yaml") == sorted(OVERRIDES)


def test_tag_weights_round_trip(tmp_path):
    text = dump_tag_weights(TAG_WEIGHTS)
    p = tmp_path / "tw.yaml"
    p.write_text(text)
    assert load_tag_weights(str(p)) == sorted(TAG_WEIGHTS)
    # the emitted YAML is plain nested mappings (parsable by any yaml reader)
    assert yaml.safe_load(text)["query"]["join"] == 5
