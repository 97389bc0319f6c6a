from .loader import hamming_native  # noqa
