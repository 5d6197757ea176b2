"""Logging setup + metric logging, cadence-compatible with the reference
(reference: codes/run.py §set_logger ≈L148-170 and §log_metrics ≈L173-177)
so training logs diff cleanly against reference runs."""

from __future__ import annotations

import logging
import os
from typing import Dict


def set_logger(save_path: str | None, do_train: bool) -> None:
    """python logging -> <save_path>/train.log (test.log when not training)
    + console, format '%(asctime)s %(levelname)s %(message)s'."""
    handlers = []
    if save_path and _is_process_zero():
        # multi-host fleets: one writer — N hosts appending to the same
        # file on a shared filesystem would interleave garbage
        os.makedirs(save_path, exist_ok=True)
        log_file = os.path.join(save_path, "train.log" if do_train else "test.log")
        handlers.append(logging.FileHandler(log_file, mode="a"))
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    for h in list(root.handlers):
        root.removeHandler(h)
    fmt = logging.Formatter(
        "%(asctime)s %(levelname)s %(message)s", datefmt="%Y-%m-%d %H:%M:%S"
    )
    for h in handlers + [logging.StreamHandler()]:
        h.setFormatter(fmt)
        root.addHandler(h)


def _is_process_zero() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def log_metrics(mode: str, step: int, metrics: Dict[str, float]) -> None:
    """'<mode> <metric> at step <step>: <value>' per metric
    (codes/run.py §log_metrics)."""
    for metric, value in metrics.items():
        logging.info("%s %s at step %d: %f", mode, metric, step, value)
