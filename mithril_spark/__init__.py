"""mithril_spark — PySpark-native full-text index build + BM25 query engine.

A from-scratch rebuild of the capabilities of the 498-search-engine/mithril
reference (C++), re-expressed Spark-first. See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"
