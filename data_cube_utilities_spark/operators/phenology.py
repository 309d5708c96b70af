"""Per-series phenology metrics — the xr_phenology family
(dea_tools/temporal.py:278-497) re-expressed as one grouped-map kernel.

Metrics (amplitude method, threshold factor configurable):
  POS  time of peak                     vPOS  value at peak
  SOS  first time before POS where v >= trough + f*amplitude    vSOS
  EOS  last  time after  POS where v >= trough + f*amplitude    vEOS
  Trough  min value                     AOS   amplitude (vPOS - trough)
  LOS  EOS - SOS (seconds)
  ROG  rate of greening (vPOS-vSOS)/(POS-SOS)
  ROS  rate of senescence (vEOS-vPOS)/(EOS-POS)
  IOS  trapezoidal integral of v over [SOS, EOS]

Gap handling follows the reference's fast_completion: NaNs forward-filled
along time, leading NaNs seeded with the series mean
(dea_tools/temporal.py:78-119).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def phenology_np(t: np.ndarray, v: np.ndarray, factor: float = 0.5) -> dict:
    """t: epoch seconds (sorted), v: values (may contain NaN)."""
    v = np.asarray(v, dtype=np.float64).copy()
    t = np.asarray(t, dtype=np.float64)
    # fast_completion: ffill, seed leading NaNs with the mean
    if np.isnan(v).any():
        mean = np.nanmean(v)
        if np.isnan(mean):
            return None
        last = mean
        for i in range(len(v)):
            if np.isnan(v[i]):
                v[i] = last
            else:
                last = v[i]
    ipos = int(np.argmax(v))
    vpos = float(v[ipos])
    trough = float(v.min())
    aos = vpos - trough
    thresh = trough + factor * aos
    before = np.nonzero(v[: ipos + 1] >= thresh)[0]
    isos = int(before[0]) if len(before) else ipos
    after = np.nonzero(v[ipos:] >= thresh)[0]
    ieos = int(ipos + after[-1]) if len(after) else ipos
    sos_t, pos_t, eos_t = t[isos], t[ipos], t[ieos]
    vsos, veos = float(v[isos]), float(v[ieos])
    rog = (vpos - vsos) / (pos_t - sos_t) if pos_t > sos_t else float("nan")
    ros = (veos - vpos) / (eos_t - pos_t) if eos_t > pos_t else float("nan")
    seg = slice(isos, ieos + 1)
    ios = float(np.trapz(v[seg], t[seg])) if ieos > isos else 0.0
    return dict(SOS=float(sos_t), POS=float(pos_t), EOS=float(eos_t),
                vSOS=vsos, vPOS=vpos, vEOS=veos,
                Trough=trough, AOS=float(aos),
                LOS=float(eos_t - sos_t), ROG=float(rog), ROS=float(ros),
                IOS=ios)


METRICS = ["SOS", "POS", "EOS", "vSOS", "vPOS", "vEOS", "Trough", "AOS",
           "LOS", "ROG", "ROS", "IOS"]


def phenology(df: DataFrame, keys: Sequence[str], time_col: str,
              value_col: str, factor: float = 0.5,
              tiebreak: Sequence[str] = ()) -> DataFrame:
    """groupBy(keys).applyInPandas phenology — the per-pixel fan-out shape
    (SURVEY.md 3.3) with deterministic in-group ordering."""
    key_list = list(keys)
    schema = (", ".join(f"{k} long" for k in key_list) + ", "
              + ", ".join(f"{m} double" for m in METRICS) + ", n int")
    sort_cols = [time_col, *tiebreak]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols)
        t = pdf[time_col].astype("int64").to_numpy() / 1e9
        v = pdf[value_col].to_numpy(np.float64)
        row = {k: [pdf[k].iloc[0]] for k in key_list}
        res = phenology_np(t, v, factor)
        if res is None:
            res = {m: float("nan") for m in METRICS}
        for m in METRICS:
            row[m] = [res[m]]
        row["n"] = [len(pdf)]
        return pd.DataFrame(row)

    return df.groupBy(*keys).applyInPandas(kernel, schema)
