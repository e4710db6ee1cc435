"""Scalar/column function library — the reference has no scalar function
layer (SURVEY.md §2.8: string/math logic lived in user mapper code);
this package adds the text-analysis and multimodal extension functions
on top of the complete ``pyspark.sql.functions`` superset."""
