from . import cities, flatten, http_weather, schemas, sink  # noqa: F401
