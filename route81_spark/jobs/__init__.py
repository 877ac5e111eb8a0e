from route81_spark.jobs.producer import direct_read_job, streaming_producer_job
from route81_spark.jobs.consumer import consumer_job, apply_consumer_batch

__all__ = [
    "direct_read_job",
    "streaming_producer_job",
    "consumer_job",
    "apply_consumer_batch",
]
