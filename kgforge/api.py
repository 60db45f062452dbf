"""Library entry points mirroring the reference's two REST endpoints
(AnonymizationRestController.java:35-70) — no HTTP, config loader injectable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kgforge.anonymize.engine import AnonymizationReport, anonymize_triples
from kgforge.anonymize.flat_output import flat_json_output
from kgforge.config import CONFIG_BY_URL, AnonymizationConfig
from kgforge.ingest import flat_rows_to_triples, jsonld_to_triples


def resolve_config(configuration_url: str | None, config: AnonymizationConfig | None):
    if config is not None:
        return config
    if configuration_url in CONFIG_BY_URL:
        return CONFIG_BY_URL[configuration_url]
    raise ValueError(f"no configuration available for {configuration_url!r}")


def anonymize_flat_json(
    spark: SparkSession,
    request: dict,
    config: AnonymizationConfig | None = None,
) -> dict:
    """PUT /api/anonymization/flatjson equivalent: request dict → response dict."""
    cfg = resolve_config(request.get("configurationUrl"), config)
    prefix = request["prefix"]
    triples = flat_rows_to_triples(spark, request["data"], prefix)
    calculate_kpi = request.get("calculateKpi", True)
    out, _report = anonymize_triples(
        triples,
        cfg,
        calculate_kpi=calculate_kpi,
        include_original_data=request.get("includeOriginalData", False),
        use_adjusted_attributes=request.get("useAdjustedAttributes", True),
        random_seed=request.get("randomSeed"),
        order_pred=prefix + "counter",
    )
    return flat_json_output(out, cfg, prefix, calculate_kpi)


def anonymize_jsonld(
    spark: SparkSession,
    request: dict,
    config: AnonymizationConfig | None = None,
) -> tuple[DataFrame, AnonymizationReport]:
    """PUT /api/anonymization equivalent: returns the anonymized triple table."""
    cfg = resolve_config(request.get("configurationUrl"), config)
    triples = jsonld_to_triples(spark, request["data"])
    return anonymize_triples(
        triples,
        cfg,
        calculate_kpi=request.get("calculateKpi", True),
        include_original_data=request.get("includeOriginalData", False),
        use_adjusted_attributes=request.get("useAdjustedAttributes", True),
        random_seed=request.get("randomSeed"),
    )
