"""Shared argparse helpers for the CLIs."""


def strtobool(v) -> bool:
    """Boolean flag VALUE parser.

    The reference CLIs use ``type=bool`` (e.g.
    /root/reference/train_movingfashion.py:171), under which
    ``--noise False`` parses as True — a documented reference bug, not
    copied here: any of 0/false/no/off (case-insensitive) disables, the
    defaults are unchanged.
    """
    s = str(v).strip().lower()
    if s in ("1", "true", "yes", "on", "y", "t"):
        return True
    if s in ("0", "false", "no", "off", "n", "f", ""):
        return False
    raise ValueError(f"expected a boolean, got {v!r}")
