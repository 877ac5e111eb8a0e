from route81_spark.model.schemas import (
    change_event_schema,
    envelope_schema,
    decode_envelope,
)

__all__ = ["change_event_schema", "envelope_schema", "decode_envelope"]
