from seriesly_spark.operators.reducers import REDUCERS, ReducerSpec

__all__ = ["REDUCERS", "ReducerSpec"]
