from seriesly_spark.plans.query import SerieslyQuery, seriesly_query
from seriesly_spark.plans.emit import to_seriesly_json

__all__ = ["SerieslyQuery", "seriesly_query", "to_seriesly_json"]
