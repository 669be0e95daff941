from bitcoin_datawarehouse_spark.functions.numeric import dsum, davg, SQL_DSUM, SQL_DAVG

__all__ = ["dsum", "davg", "SQL_DSUM", "SQL_DAVG"]
