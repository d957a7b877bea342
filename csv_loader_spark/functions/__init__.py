from csv_loader_spark.functions import ids, text, timestamps, vectors  # noqa: F401
