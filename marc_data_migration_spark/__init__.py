"""PySpark-native CDC / incremental-ingest engine for conversation
transcripts — the capabilities of ``hatfieldlibrary/marc_data_migration``
re-expressed Spark-first (DataFrame/Catalyst, Structured Streaming,
vectorized pandas UDFs). See SURVEY.md for the operator-by-operator
mapping to the reference.
"""

__version__ = "0.1.0"
