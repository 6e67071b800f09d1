#!/usr/bin/env python
"""Record the train-and-predict determinism golden (VERDICT r2 item 7).

Runs the shared recipe from tests/test_train_golden.py — 3 train steps of a
tiny DynUNet on the pipeline fixture case WITH augmentations on (pinning
augment RNG threading), then a checkpoint round-trip and one prediction —
and records losses + prediction to tests/fixtures/train_golden.npz.

Run on the CPU backend (tests/conftest.py environment):
    env PYTHONPATH= JAX_PLATFORMS=cpu python tools/make_train_fixture.py
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from test_train_golden import run_recipe  # noqa: E402


def main():
    losses, prediction = run_recipe()
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "fixtures", "train_golden.npz")
    np.savez(out, losses=np.asarray(losses, np.float64),
             prediction=np.asarray(prediction, np.float32))
    print("losses:", losses)
    print("prediction stats:", prediction.mean(), prediction.std())
    print("wrote", out)


if __name__ == "__main__":
    main()
