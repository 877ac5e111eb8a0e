from route81_spark.sources.direct_read import direct_read
from route81_spark.sources.change_events import synthetic_change_events, CHANGE_EVENT_META

__all__ = ["direct_read", "synthetic_change_events", "CHANGE_EVENT_META"]
