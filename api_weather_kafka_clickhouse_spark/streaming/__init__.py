from . import pipeline, stateful, windows  # noqa: F401
