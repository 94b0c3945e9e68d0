from catme_etl_j_spark.functions.numeric import (  # noqa: F401
    avg4,
    dec2,
    dec4,
    money2,
    rdet,
    rdet_sql,
)
