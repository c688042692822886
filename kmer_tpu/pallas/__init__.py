from .segment_counts import _PALLAS_OK, segment_counts_sorted  # noqa: F401


def pallas_available() -> bool:
    return _PALLAS_OK
