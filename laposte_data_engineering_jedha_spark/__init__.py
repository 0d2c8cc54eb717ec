"""laposte_data_engineering_jedha_spark — PySpark-native rebuild of the
SuperCourier ETL analytics engine (reference: Engeryu/LaPoste_Data_Engineering_Jedha).

The reference is a single-process eager-Polars batch ETL for parcel-delivery
analytics. This package re-expresses the same capabilities Spark-first:

- every parity operator is a pure Catalyst expression (zero Python UDFs on
  the parity path → whole-stage codegen end-to-end),
- the weather enrichment is a broadcast left join,
- sources/sinks cover the reference's five formats,
- plus the 100 TB-scale extensions (dedup, similarity search, text analysis,
  multimodal columns, structured streaming) the reference lacks.

Layout:
    functions/   scalar expression builders (SURVEY.md §2.3/§2.7)
    sources/     readers + seeded generator + weather client (§2.1)
    operators/   transform stages, dedup, similarity, text ops (§2.3-2.5, M6)
    plans/       pipeline orchestration, sinks, manifest (§2.2, §2.9)
    streaming/   structured-streaming extension over the events table (§2.8)
"""

__version__ = "0.1.0"
