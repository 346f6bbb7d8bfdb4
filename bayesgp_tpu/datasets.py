"""Bundled datasets (converted from the reference's data/*.rda payloads;
reference docs R/data.R:1-25).

- covid_canada: 787 rows — Date (days since 1970-01-01), new_deaths, t,
  weekdays1-6, index.
- sim1data: 3596 rows — exposure, eta, prob, case, subject,
  exposure_binned.
"""
from __future__ import annotations

import os

import numpy as np

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def _load(name: str) -> dict:
    with np.load(os.path.join(_DATA_DIR, f"{name}.npz")) as z:
        return {k: z[k] for k in z.files}


def covid_canada() -> dict:
    return _load("covid_canada")


def sim1data() -> dict:
    return _load("sim1data")
