"""Full RDLS v0.3 JSON Schema (Draft 2020-12), constructed programmatically.

The reference validates every produced record against the published Risk Data
Library Standard v0.3 schema (``rdls/schema/rdls_schema_v0.3.json``; used at
``06…ipynb:1701``, ``07…ipynb:437``, ``13…ipynb:523``).  Round 2 validated
against a miniature RDLS-*style* literal; this module carries the real
structure of the public standard:

- the 7 required top-level fields
  ``[id, title, risk_data_type, attributions, spatial, license, resources]``
- all 37 ``$defs`` (closed enum codelists + the nested object definitions
  with their ``required`` lists)
- the constraint data the reference consumes from the schema's two
  non-standard keys: ``hazard_process_mappings`` (hazard_type -> allowed
  process types, ``09…ipynb:218``) and a representative
  ``intensity_measure_mappings`` slice (``11…ipynb`` cell 4).

The codelists are data from the public RDLS v0.3 standard
(https://docs.riskdatalibrary.org/), not reference code.  Two open lists are
carried as representative subsets rather than verbatim standard text: the
ISO-3166 country enum covers the codes the engine's country dim can emit plus
the common corpus countries, and the ISO-4217 currency enum covers the active
codes the currency detector can emit (the standard embeds the full historical
table; validation only ever sees engine-emitted codes, so the subset is
behavior-equivalent and documented here).
"""

from __future__ import annotations

from typing import Any

# --- closed codelists ($defs enums) ---------------------------------------

HAZARD_TYPES = [
    "coastal_flood", "convective_storm", "drought", "extreme_temperature",
    "flood", "wildfire", "strong_wind", "earthquake", "landslide",
    "tsunami", "volcanic",
]

PROCESS_TYPES = [
    "coastal_flood", "storm_surge", "tornado", "agricultural_drought",
    "hydrological_drought", "meteorological_drought", "socioeconomic_drought",
    "primary_rupture", "secondary_rupture", "ground_motion", "liquefaction",
    "extreme_cold", "extreme_heat", "fluvial_flood", "pluvial_flood",
    "groundwater_flood", "snow_avalanche", "landslide_general",
    "landslide_rockslide", "landslide_mudflow", "landslide_rockfall",
    "tsunami", "ashfall", "volcano_ballistics", "lahar", "lava",
    "pyroclastic_flow", "wildfire", "extratropical_cyclone",
    "tropical_cyclone",
]

RISK_DATA_TYPES = ["hazard", "exposure", "vulnerability", "loss"]
ANALYSIS_TYPES = ["probabilistic", "deterministic", "empirical"]
FUNCTION_APPROACHES = ["analytical", "empirical", "hybrid", "judgement"]
RELATIONSHIP_TYPES = ["math_parametric", "math_bespoke", "discrete"]

EXPOSURE_CATEGORIES = [
    "agriculture", "buildings", "infrastructure", "population",
    "natural_environment", "economic_indicator", "development_index",
]

TAXONOMIES = [
    "GED4ALL", "MOVER", "GLIDE", "EMDAT", "USGS_EHP", "OED", "HAZUS",
    "EMS-98", "PAGER", "CDC-SVI", "INFORM", "Custom",
]

METRIC_DIMENSIONS = [
    "structure", "content", "product", "disruption", "population", "index",
]

CALCULATION_TYPES = ["inferred", "observed", "simulated"]

IMPACT_METRICS = [
    "damage_ratio", "mean_damage_ratio", "probability", "damage_index",
    "loss_ratio", "mean_loss_ratio", "downtime_vulnerability",
    "casualty_ratio_vulnerability", "economic_loss_value",
    "insured_loss_value", "casualty_count", "casualty_ratio_loss",
    "loss_annual_average_value", "loss_probable_maximum_value",
    "at_risk_value", "at_risk_tail_value", "downtime_loss", "asset_loss",
    "displaced_count", "exposure_to_hazard",
]

IMPACT_TYPES = ["direct", "indirect", "total"]
LOSS_TYPES = ["ground_up", "insured", "gross", "count", "net_precat", "net_postcat"]
ATTRIBUTION_ROLES = ["publisher", "creator", "contact_point"]
LOCATION_SCALES = ["global", "regional", "national", "sub-national", "urban"]

DATA_FORMATS = [
    "GeoTIFF (tif)", "Cloud Optimized GeoTIFF (cog)", "GRID (grd)",
    "NetCDF (nc)", "GRIB (grib)", "HDF5 (hdf5)", "Zarr (zarr)",
    "GeoPackage (gpkg)", "GeoJSON (geojson)", "FlatGeobuf (fgb)",
    "Shapefile (shp)", "File Geodatabase (gdb)", "KML (kml)", "CSV (csv)",
    "Parquet (parquet)", "Excel (xlsx)", "JSON (json)", "XML (xml)",
    "PDF (pdf)", "LAS (las)", "COPC (copc)",
]

ACCESS_MODALITIES = [
    "file_download", "download_page", "API", "OGC_API", "GEE_collection",
    "WMS", "WFS", "WCS", "STAC", "REST", "dashboard",
]

# ISO-3166-1 alpha-3 — the codes the engine's country resolution can emit
# (the synthetic nation dim maps to the first 25) plus common corpus
# countries; see module docstring for the subset note.
COUNTRIES = [
    "AFG", "ALB", "DZA", "AGO", "ARG", "ARM", "AUS", "AUT", "AZE", "BGD",
    "BEL", "BEN", "BOL", "BIH", "BWA", "BRA", "BGR", "BFA", "BDI", "KHM",
    "CMR", "CAN", "CAF", "TCD", "CHL", "CHN", "COL", "COD", "COG", "CRI",
    "CIV", "HRV", "CUB", "CYP", "CZE", "DNK", "DJI", "DOM", "ECU", "EGY",
    "SLV", "ERI", "EST", "ETH", "FJI", "FIN", "FRA", "GAB", "GMB", "GEO",
    "DEU", "GHA", "GRC", "GTM", "GIN", "GNB", "GUY", "HTI", "HND", "HUN",
    "ISL", "IND", "IDN", "IRN", "IRQ", "IRL", "ISR", "ITA", "JAM", "JPN",
    "JOR", "KAZ", "KEN", "PRK", "KOR", "KWT", "KGZ", "LAO", "LVA", "LBN",
    "LSO", "LBR", "LBY", "LTU", "LUX", "MDG", "MWI", "MYS", "MDV", "MLI",
    "MLT", "MRT", "MUS", "MEX", "MDA", "MNG", "MNE", "MAR", "MOZ", "MMR",
    "NAM", "NPL", "NLD", "NZL", "NIC", "NER", "NGA", "MKD", "NOR", "OMN",
    "PAK", "PAN", "PNG", "PRY", "PER", "PHL", "POL", "PRT", "QAT", "ROU",
    "RUS", "RWA", "SAU", "SEN", "SRB", "SLE", "SGP", "SVK", "SVN", "SOM",
    "ZAF", "SSD", "ESP", "LKA", "SDN", "SUR", "SWE", "CHE", "SYR", "TWN",
    "TJK", "TZA", "THA", "TLS", "TGO", "TTO", "TUN", "TUR", "TKM", "UGA",
    "UKR", "ARE", "GBR", "USA", "URY", "UZB", "VEN", "VNM", "YEM", "ZMB",
    "ZWE",
]

# ISO-4217 active codes the engine's currency detection can emit.
CURRENCIES = [
    "AED", "AFN", "ALL", "AMD", "AOA", "ARS", "AUD", "AZN", "BAM", "BDT",
    "BGN", "BHD", "BIF", "BND", "BOB", "BRL", "BWP", "BYN", "CAD", "CDF",
    "CHF", "CLP", "CNY", "COP", "CRC", "CUP", "CZK", "DJF", "DKK", "DOP",
    "DZD", "EGP", "ERN", "ETB", "EUR", "FJD", "GBP", "GEL", "GHS", "GMD",
    "GNF", "GTQ", "GYD", "HNL", "HRK", "HTG", "HUF", "IDR", "ILS", "INR",
    "IQD", "IRR", "ISK", "JMD", "JOD", "JPY", "KES", "KGS", "KHR", "KPW",
    "KRW", "KWD", "KZT", "LAK", "LBP", "LKR", "LRD", "LSL", "LYD", "MAD",
    "MDL", "MGA", "MKD", "MMK", "MNT", "MRU", "MUR", "MVR", "MWK", "MXN",
    "MYR", "MZN", "NAD", "NGN", "NIO", "NOK", "NPR", "NZD", "OMR", "PAB",
    "PEN", "PGK", "PHP", "PKR", "PLN", "PYG", "QAR", "RON", "RSD", "RUB",
    "RWF", "SAR", "SBD", "SCR", "SDG", "SEK", "SGD", "SLL", "SOS", "SRD",
    "SSP", "SYP", "SZL", "THB", "TJS", "TMT", "TND", "TOP", "TRY", "TTD",
    "TWD", "TZS", "UAH", "UGX", "USD", "UYU", "UZS", "VND", "VUV", "WST",
    "XAF", "XCD", "XOF", "XPF", "YER", "ZAR", "ZMW", "ZWL",
]

# --- non-standard schema keys consumed as constraint data ------------------
# (hazard_type -> allowed process types; 09…ipynb:218)
HAZARD_PROCESS_MAPPINGS: dict[str, list[str]] = {
    "drought": ["agricultural_drought", "hydrological_drought",
                "meteorological_drought", "socioeconomic_drought"],
    "flood": ["fluvial_flood", "pluvial_flood", "groundwater_flood"],
    "earthquake": ["primary_rupture", "secondary_rupture", "ground_motion",
                   "liquefaction"],
    "extreme_temperature": ["extreme_cold", "extreme_heat"],
    "strong_wind": ["extratropical_cyclone", "tropical_cyclone", "tornado"],
    "wildfire": ["wildfire"],
    "landslide": ["snow_avalanche", "landslide_general",
                  "landslide_rockslide", "landslide_mudflow",
                  "landslide_rockfall"],
    "tsunami": ["tsunami"],
    "volcanic": ["ashfall", "volcano_ballistics", "lahar", "lava",
                 "pyroclastic_flow"],
    "coastal_flood": ["coastal_flood", "storm_surge"],
    "convective_storm": ["tornado"],
}

# hazard_type -> valid intensity measures (representative slice of the
# standard's intensity_measure_mappings; 11…ipynb cell 4)
INTENSITY_MEASURE_MAPPINGS: dict[str, list[str]] = {
    "earthquake": ["PGA:g", "PGA:m/s2", "PGV:m/s", "MMI:-"],
    "flood": ["wd:m", "wd:cm", "wv:m/s", "pptn24:mm"],
    "coastal_flood": ["wd:m", "wd:cm", "slr:cm"],
    "tsunami": ["wd:m", "Rh_tsi:m", "h_tsi:m"],
    "strong_wind": ["sws_3s:km/h", "PGWS:m/s", "MSLP:hPa"],
    "convective_storm": ["sws_3s:km/h", "EF:-", "HlMaxSz:mm"],
    "drought": ["SPI:-", "SPEI:-", "PDSI:-"],
    "extreme_temperature": ["T_max:C", "T_min:C", "HI:C"],
    "wildfire": ["FI:kW/m", "FRP:MW", "BA:km2"],
    "landslide": ["d_ls:m", "v_ls:m/s", "SD:m"],
    "volcanic": ["ash_th:cm", "ash_ld:kg/m2", "dyn_p:kPa"],
}


def _enum(values: list[str]) -> dict:
    return {"type": "string", "enum": values}


def _arr(items: dict, min_items: int | None = None, unique: bool = False) -> dict:
    out: dict[str, Any] = {"type": "array", "items": items}
    if min_items is not None:
        out["minItems"] = min_items
    if unique:
        out["uniqueItems"] = True
    return out


def _ref(name: str) -> dict:
    return {"$ref": f"#/$defs/{name}"}


def _obj(required: list[str] | None, props: dict[str, dict]) -> dict:
    out: dict[str, Any] = {"type": "object", "properties": props}
    if required:
        out["required"] = required
    return out


def _vulnerability_common_props() -> dict[str, dict]:
    """The shared field set of the four function definitions
    (VulnerabilityCommonFields; each Function $def requires the same 10)."""
    return {
        "approach": _ref("function_approach"),
        "relationship": _ref("relationship_type"),
        "hazard_primary": _ref("hazard_type"),
        "hazard_secondary": _ref("hazard_type"),
        "hazard_process_primary": _ref("process_type"),
        "hazard_process_secondary": _ref("process_type"),
        "hazard_analysis_type": _ref("analysis_type"),
        "intensity_measure": _ref("intensity_measure"),
        "category": _ref("exposure_category"),
        "impact_type": _enum(IMPACT_TYPES),
        "impact_modelling": _ref("data_calculation_type"),
        "impact_metric": _ref("impact_metric"),
        "quantity_kind": {"type": "string"},
        "taxonomy": _ref("taxonomy"),
        "analysis_details": {"type": "string"},
        "id": {"type": "string"},
    }


_FUNCTION_REQUIRED = [
    "approach", "relationship", "hazard_primary", "hazard_analysis_type",
    "intensity_measure", "category", "impact_type", "impact_modelling",
    "impact_metric", "quantity_kind",
]


def _function_def(extra_props: dict[str, dict] | None = None) -> dict:
    props = _vulnerability_common_props()
    if extra_props:
        props.update(extra_props)
    return _obj(_FUNCTION_REQUIRED, props)


def build_schema() -> dict:
    """The full RDLS v0.3 schema dict (Draft 2020-12)."""
    damage_scale_props = {
        "damage_scale_name": {"type": "string"},
        "damage_states_names": {"type": "string"},
    }
    defs: dict[str, dict] = {
        # --- codelist $defs ---
        "hazard_type": _enum(HAZARD_TYPES),
        "process_type": _enum(PROCESS_TYPES),
        "intensity_measure": {"type": "string"},
        "risk_data_type": _enum(RISK_DATA_TYPES),
        "analysis_type": _enum(ANALYSIS_TYPES),
        "function_approach": _enum(FUNCTION_APPROACHES),
        "relationship_type": _enum(RELATIONSHIP_TYPES),
        "exposure_category": _enum(EXPOSURE_CATEGORIES),
        "taxonomy": _enum(TAXONOMIES),
        "metric_dimension": _enum(METRIC_DIMENSIONS),
        "data_calculation_type": _enum(CALCULATION_TYPES),
        "impact_metric": _enum(IMPACT_METRICS),
        # --- object $defs ---
        "VulnerabilityCommonFields": _obj(None, _vulnerability_common_props()),
        "VulnerabilityFunction": _function_def(),
        "FragilityFunction": _function_def(damage_scale_props),
        "DamageToLossFunction": _function_def(damage_scale_props),
        "EngineeringDemandFunction": _function_def(
            {**damage_scale_props, "parameter": {"type": "string"}}
        ),
        "SocioEconomicIndex": _obj(
            ["indicator_name", "indicator_code", "description",
             "reference_year"],
            {
                "scheme": _ref("taxonomy"),
                "indicator_name": {"type": "string"},
                "indicator_code": {"type": "string"},
                "description": {"type": "string"},
                "threshold": {"type": "string"},
                "reference_year": {"type": "integer"},
                "uri": {"type": "string"},
                "analysis_details": {"type": "string"},
                "id": {"type": "string"},
            },
        ),
        "Entity": _obj(
            ["name"],
            {"name": {"type": "string"}, "email": {"type": "string"},
             "url": {"type": "string"}},
        ),
        "Attribution": _obj(
            ["id", "entity", "role"],
            {
                "id": {"type": "string"},
                "entity": _ref("Entity"),
                "role": _enum(ATTRIBUTION_ROLES),
            },
        ),
        "Related_resource": _obj(
            ["id"],
            {
                "id": {"type": "string"},
                "name": {"type": "string"},
                "author_names": _arr({"type": "string"}),
                "date_published": {"type": "string"},
                "url": {"type": "string"},
                "doi": {"type": "string"},
            },
        ),
        "Source": _obj(
            ["id"],
            {
                "id": {"type": "string"},
                "name": {"type": "string"},
                "description": {"type": "string"},
                "lineage": {"type": "string"},
                "url": {"type": "string"},
                "type": {"type": "string"},
                "component": _ref("risk_data_type"),
                "license": {"type": "string"},
            },
        ),
        "Period": _obj(
            None,
            {
                "start": {"type": "string"},
                "end": {"type": "string"},
                "duration": {"type": "string"},
                "temporal_resolution": {"type": "string"},
            },
        ),
        "Location": _obj(
            None,
            {
                "scale": _enum(LOCATION_SCALES),
                "countries": _arr(_enum(COUNTRIES)),
                "gazetteer_entries": _arr(_ref("Gazetteer_entry")),
                "bbox": _arr({"type": "number"}),
                "centroid": _arr({"type": "number"}),
            },
        ),
        "Gazetteer_entry": _obj(
            ["id"],
            {
                "id": {"type": "string"},
                "scheme": {"type": "string"},
                "description": {"type": "string"},
                "uri": {"type": "string"},
            },
        ),
        "Geometry": _obj(
            None,
            {"type": {"type": "string"}, "coordinates": _arr({})},
        ),
        "Hazard": _obj(
            ["id", "type", "hazard_process"],
            {
                "id": {"type": "string"},
                "type": _ref("hazard_type"),
                "hazard_process": _ref("process_type"),
                "intensity_measure": _ref("intensity_measure"),
                "trigger": _ref("Trigger"),
            },
        ),
        "Trigger": _obj(
            None,
            {"type": _ref("hazard_type"), "hazard_process": _ref("process_type")},
        ),
        "Event_set": _obj(
            ["id", "hazards", "analysis_type"],
            {
                "id": {"type": "string"},
                "hazards": _arr(_ref("Hazard"), min_items=1),
                "analysis_type": _ref("analysis_type"),
                "frequency_distribution": {"type": "string"},
                "seasonality": {"type": "string"},
                "calculation_method": _ref("data_calculation_type"),
                "event_count": {"type": "number"},
                "occurrence_range": {"type": "string"},
                "events": _arr(_ref("Event"), min_items=1),
            },
        ),
        "Event": _obj(
            ["id", "calculation_method", "hazard", "occurrence"],
            {
                "id": {"type": "string"},
                "disaster_identifiers": _arr(_ref("Classification")),
                "calculation_method": _ref("data_calculation_type"),
                "hazard": _ref("Hazard"),
                "occurrence": _obj(
                    None,
                    {
                        "probabilistic": _ref("Probabilistic"),
                        "deterministic": _obj(
                            None,
                            {"index_criteria": {"type": "string"},
                             "time": _ref("Period")},
                        ),
                        "empirical": _obj(
                            None,
                            {"temporal": _ref("Period"),
                             "return_period": {"type": "number"}},
                        ),
                    },
                ),
                "description": {"type": "string"},
            },
        ),
        "Probabilistic": _obj(
            None,
            {
                "return_period": {"type": "number"},
                "event_rate": {"type": "number"},
                "probability": _obj(
                    None,
                    {"value": {"type": "number"}, "span": {"type": "number"}},
                ),
            },
        ),
        "Classification": _obj(
            ["id"],
            {
                "scheme": _ref("taxonomy"),
                "id": {"type": "string"},
                "description": {"type": "string"},
                "uri": {"type": "string"},
            },
        ),
        "Exposure_item": _obj(
            ["category", "metrics"],
            {
                "id": {"type": "string"},
                "category": _ref("exposure_category"),
                "taxonomy": _ref("taxonomy"),
                "metrics": _arr(_ref("Metric"), min_items=1, unique=True),
            },
        ),
        "Metric": _obj(
            ["id", "dimension", "quantity_kind"],
            {
                "id": {"type": "string"},
                "dimension": _ref("metric_dimension"),
                "quantity_kind": {"type": "string"},
                "currency": _enum(CURRENCIES),
            },
        ),
        "Resource": _obj(
            ["id", "title", "description", "data_format"],
            {
                "id": {"type": "string"},
                "title": {"type": "string"},
                "description": {"type": "string"},
                "data_format": _enum(DATA_FORMATS),
                "access_modality": _enum(ACCESS_MODALITIES),
                "spatial_resolution": {"type": "number"},
                "coordinate_system": {"type": "string"},
                "access_url": {"type": "string"},
                "download_url": {"type": "string"},
                "temporal": _ref("Period"),
            },
        ),
        "Link": _obj(
            ["href", "rel"],
            {"href": {"type": "string"}, "rel": {"type": "string"}},
        ),
        "Losses": _obj(
            ["id", "hazard_type", "asset_category", "asset_dimension",
             "impact_and_losses"],
            {
                "id": {"type": "string"},
                "hazard_type": _ref("hazard_type"),
                "hazard_process": _ref("process_type"),
                "asset_category": _ref("exposure_category"),
                "asset_dimension": _ref("metric_dimension"),
                "impact_and_losses": _obj(
                    ["impact_type", "impact_modelling", "impact_metric",
                     "quantity_kind", "loss_type", "loss_approach",
                     "loss_frequency_type"],
                    {
                        "impact_type": _enum(IMPACT_TYPES),
                        "impact_modelling": _ref("data_calculation_type"),
                        "impact_metric": _ref("impact_metric"),
                        "quantity_kind": {"type": "string"},
                        "currency": _enum(CURRENCIES),
                        "loss_type": _enum(LOSS_TYPES),
                        "loss_approach": _ref("function_approach"),
                        "loss_frequency_type": _ref("analysis_type"),
                    },
                ),
                "lineage": _obj(
                    None,
                    {
                        "hazard_dataset": {"type": "string"},
                        "exposure_dataset": {"type": "string"},
                        "vulnerability_dataset": {"type": "string"},
                    },
                ),
                "description": {"type": "string"},
            },
        ),
    }
    assert len(defs) == 37, f"expected 37 $defs, got {len(defs)}"

    return {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$id": "rdls_schema_v0.3",
        "title": "Risk Data Library Standard v0.3 dataset record",
        "type": "object",
        "required": [
            "id", "title", "risk_data_type", "attributions", "spatial",
            "license", "resources",
        ],
        "properties": {
            "id": {"type": "string"},
            "title": {"type": "string"},
            "description": {"type": "string"},
            "risk_data_type": _arr(_ref("risk_data_type"), min_items=1,
                                   unique=True),
            "version": {"type": "string"},
            "purpose": {"type": "string"},
            "project": {"type": "string"},
            "details": {"type": "string"},
            "spatial": _ref("Location"),
            "license": {"type": "string"},
            "license_url": {"type": "string"},
            "attributions": _arr(_ref("Attribution"), min_items=1),
            "sources": _arr(_ref("Source")),
            "referenced_by": _arr(_ref("Related_resource")),
            "resources": _arr(_ref("Resource"), min_items=1, unique=True),
            "hazard": _obj(["event_sets"],
                           {"event_sets": _arr(_ref("Event_set"), min_items=1,
                                               unique=True)}),
            "exposure": _arr(_ref("Exposure_item"), min_items=1),
            "vulnerability": _obj(
                None,
                {
                    "functions": _obj(
                        None,
                        {
                            "vulnerability": _arr(_ref("VulnerabilityFunction"),
                                                  min_items=1, unique=True),
                            "fragility": _arr(_ref("FragilityFunction"),
                                              min_items=1, unique=True),
                            "damage_to_loss": _arr(_ref("DamageToLossFunction"),
                                                   min_items=1, unique=True),
                            "engineering_demand": _arr(
                                _ref("EngineeringDemandFunction"),
                                min_items=1, unique=True),
                        },
                    ),
                    "socio_economic": _arr(_ref("SocioEconomicIndex"),
                                           min_items=1),
                },
            ),
            "loss": _obj(None, {"losses": _arr(_ref("Losses"), min_items=1,
                                               unique=True)}),
            "links": _arr(_ref("Link")),
        },
        "$defs": defs,
    }


FULL_RDLS_SCHEMA = build_schema()
