from types import SimpleNamespace

const = SimpleNamespace()
