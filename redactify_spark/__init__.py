"""redactify_spark: PySpark-native KG-construction engine with the
mention-detection semantics of rushilpatel21/Redactify (see SURVEY.md)."""

__version__ = "0.1.0"
