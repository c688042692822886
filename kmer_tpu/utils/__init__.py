from .logging import get_logger, StatsCounters  # noqa: F401
from .profiling import phase_timer, Profile  # noqa: F401
from .checkpoint import save_table, load_table, save_index, load_index  # noqa: F401
