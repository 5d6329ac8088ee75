"""Interactive stdin helpers (reference utils.py:7-34 parity)."""
from __future__ import annotations


def get_bool_from_input(prompt: str) -> bool:
    while True:
        v = input(f"{prompt} (y/n): ").strip().lower()
        if v in ("y", "yes", "true", "1"):
            return True
        if v in ("n", "no", "false", "0"):
            return False


def get_int_from_input(prompt: str) -> int:
    while True:
        try:
            return int(input(f"{prompt}: ").strip())
        except ValueError:
            continue


def get_float_from_input(prompt: str) -> float:
    while True:
        try:
            return float(input(f"{prompt}: ").strip())
        except ValueError:
            continue
