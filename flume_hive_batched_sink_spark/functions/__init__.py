from .partition import (  # noqa: F401
    bucket_ts,
    derive_logdate,
    partition_spec_value,
    partition_spec_values,
)
