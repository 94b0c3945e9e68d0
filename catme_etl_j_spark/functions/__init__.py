from catme_etl_j_spark.functions.numeric import avg4, dec2, dec4, money2  # noqa: F401
