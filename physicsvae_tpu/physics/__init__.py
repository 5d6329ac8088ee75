from . import (contacts, dynamics, fk, ik, linalg, model, obstacles,  # noqa: F401
               self_collision, state, step)
