from catme_etl_j_spark.converter.api import ConvertResult, convert  # noqa: F401
from catme_etl_j_spark.converter.errors import (  # noqa: F401
    ConversionError,
    SheetNotFoundError,
    ZipBombDetectedError,
)
from catme_etl_j_spark.converter.reader import read_xlsx  # noqa: F401
