from .fixedpoint import fixed, unfixed  # noqa: F401
