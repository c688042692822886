from .extract_kernel import extract_stream_pallas, pallas_available  # noqa: F401
