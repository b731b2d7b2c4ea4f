from . import cleaning, hashing, text, vectors  # noqa: F401
