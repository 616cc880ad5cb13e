from . import pipeline, windows  # noqa: F401
