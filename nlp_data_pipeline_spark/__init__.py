"""nlp_data_pipeline_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of
``khhoremuzairkhan/NLP_Data_Pipeline`` (a single-file Streamlit NLP app,
surveyed in /root/repo/SURVEY.md), extended into a general large-scale
data-pipeline engine:

- relational core (scans, joins, aggregates, windows, set ops) riding
  Catalyst/Tungsten/AQE — zero custom planner code,
- reference-parity text operators (clean / tokenize / sentence-split /
  extractive summary / tf-idf / LDA tags / quality metrics),
- LLM-training-data operators (exact + MinHash/SimHash near-dedup,
  embedding similarity search, language-id, quality scoring,
  fingerprinting, multimodal binary-column plumbing),
- Structured Streaming variants of the event analytics.

Everything is declared through the DataFrame API so Catalyst performs
predicate pushdown, column pruning, join selection, and AQE re-planning;
Python UDFs appear only where built-ins genuinely cannot express the
semantics (and then always Arrow-vectorized).
"""

__version__ = "0.1.0"

from nlp_data_pipeline_spark.session import get_spark  # noqa: F401
