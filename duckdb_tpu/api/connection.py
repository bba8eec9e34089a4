"""Placeholder Connection API — fleshed out with the SQL frontend."""


class Connection:
    pass


def connect(database: str = ":memory:"):
    return Connection()
