"""oscar_spark — PySpark-native full-text index + BM25 engine (see SURVEY.md)."""
