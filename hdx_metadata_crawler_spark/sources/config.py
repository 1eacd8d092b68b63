"""YAML config source/sink (SURVEY S9): the reference's config relations
(tag_to_rdls_component.yaml, org_hints.yaml, overrides.yaml — loaded with
``yaml.safe_load`` in ``04…ipynb`` cell-2-1 and WRITTEN by NB03's emitter,
``03…ipynb:750-808``) as driver-side loads that become broadcast dims.

The engine's scoring queries bake the same relations in as literal tables
(Catalyst constant-folds them — the scale-correct form for config-sized
data); this module is the round-trip path: parse the YAML shapes into the
exact (component, tag, weight) / (org_substr, component, weight) /
(doc_id, decision, components) tuples those literals carry, and emit them
back.  tests/test_config_yaml.py asserts the shipped config files load
EQUAL to the in-plan literals, so the YAML and the plans cannot drift.
"""

from __future__ import annotations

import yaml


def load_tag_weights(path: str) -> list[tuple[str, str, int]]:
    """tag_to_rdls_component.yaml shape: {component: {tag: weight}} →
    [(component, tag, weight)] sorted for determinism."""
    with open(path, encoding="utf-8") as f:
        data = yaml.safe_load(f) or {}
    return sorted(
        (comp, tag, int(w))
        for comp, tags in data.items()
        for tag, w in (tags or {}).items()
    )


def load_org_hints(path: str) -> list[tuple[str, str, int]]:
    """org_hints.yaml shape: {org_substr: {component: weight}} →
    [(org_substr, component, weight)] sorted."""
    with open(path, encoding="utf-8") as f:
        data = yaml.safe_load(f) or {}
    return sorted(
        (org, comp, int(w))
        for org, comps in data.items()
        for comp, w in (comps or {}).items()
    )


def load_overrides(path: str) -> list[tuple[int, str, str | None]]:
    """overrides.yaml shape (05…ipynb:645): {overrides: {id: {decision,
    components: [..]}}} → [(id, decision, 'a,b' | None)] sorted by id."""
    with open(path, encoding="utf-8") as f:
        data = yaml.safe_load(f) or {}
    out = []
    for key, ov in (data.get("overrides") or {}).items():
        comps = ov.get("components")
        out.append(
            (
                int(key),
                str(ov.get("decision", "")).strip().lower(),
                ",".join(str(c).lower() for c in comps) if comps else None,
            )
        )
    return sorted(out)


def dump_tag_weights(rows: list[tuple[str, str, int]]) -> str:
    """Inverse emitter (NB03's write_yaml analogue): rows → YAML text."""
    nested: dict[str, dict[str, int]] = {}
    for comp, tag, w in rows:
        nested.setdefault(comp, {})[tag] = w
    return yaml.safe_dump(nested, sort_keys=True)
