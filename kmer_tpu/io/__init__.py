from .datagen import generate_test_rows, generate_sequence  # noqa: F401
