from .store import EntityStore, NotFoundError  # noqa: F401
