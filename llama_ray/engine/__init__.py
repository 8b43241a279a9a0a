from .superstep import SuperstepLoop, aggregate_messages  # noqa: F401
from .checkpoint import CheckpointManager  # noqa: F401
