"""Sources & sinks (SURVEY.md §2.1) — wrappers over ``spark.read`` /
``df.write`` reproducing the reference's InputFormat/OutputFormat
capabilities on Spark's file-source machinery."""
