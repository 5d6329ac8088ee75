from . import contacts, dynamics, fk, model, state, step  # noqa: F401
