from . import streaming_ops  # noqa: F401
from .land import land_batch, run_landing_stream  # noqa: F401
