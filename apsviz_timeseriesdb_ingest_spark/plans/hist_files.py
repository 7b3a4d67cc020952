"""Historic ADCIRC file staging — ``scripts/mvHistADCIRCFiles.py`` (S10).

Backfill path: historic harvest files carry long self-describing names
(``<model>_<storm>_<LOCATION>_<ENSEMBLE>_<GRID>_FORECAST_<TYPE>_<advisory
-dt>_<run-dt>.csv``). This module parses those names
(``scripts/mvHistADCIRCFiles.py:104-131``), matches each file to a model
run via the run-property store (``:135-160``), and stages per-run
directories with the canonical short names (``FORECAST_<TYPE>.csv`` +
``meta_`` twins, ``:171-230``) that ``ModelIngest.ingest_run`` consumes —
so a historic archive replays through the exact same ingest path as live
runs.

At scale the parse/match step is metadata work (file *names*, not
contents); staging uses copies for parity with the reference (symlinks
would do on a posix store)."""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass
from glob import glob

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dashboard_meta import get_adcirc_run_property_variables


@dataclass
class HistFile:
    file_name: str
    suite_model: str
    storm: str
    physical_location: str
    forcing_ensemblename: str
    grid: str
    advisory: str
    uid: str
    station_type: str


def _compact_dt(stamp: str) -> str:
    """``2024-01-01T06:00:00`` → ``2024010106``
    (mvHistADCIRCFiles.py:110-113)."""
    return "".join("".join(stamp.split("-")).split(":")[0].split("T"))


def parse_hist_filename(file_name: str) -> HistFile:
    """Decompose a historic forecast file name (coamps storms keep their
    two-part name, ``mvHistADCIRCFiles.py:116-124``).

    Trailing tokens: ``..._<TYPE>_<advisory-dt>_<run-dt>_<end-dt>.csv`` —
    advisory is ``parts[-3]`` and the station type ``parts[-4]``
    (``mvHistADCIRCFiles.py:110-113``, ``:195``)."""
    base = file_name[:-4] if file_name.endswith(".csv") else file_name
    parts = base.split("_")
    suite_model = parts[0]
    storm = parts[1]
    if storm == "coamps":
        storm = parts[1] + "_" + parts[2]
        physical_location = parts[3]
        ensemble = parts[4].lower()
    else:
        physical_location = parts[2]
        ensemble = parts[3].lower()
    if ensemble == "nowcast":
        grid = base.split("_NOWCAST_")[1].split("_")[0]
    else:
        grid = base.split("_FORECAST_")[0].split("_" + ensemble.upper() + "_")[1]
    advisory = _compact_dt(parts[-3])
    return HistFile(
        file_name=file_name, suite_model=suite_model, storm=storm,
        physical_location=physical_location, forcing_ensemblename=ensemble,
        grid=grid, advisory=advisory,
        uid=advisory + "-" + ensemble, station_type=parts[-4],
    )


def match_runs(config_items: DataFrame, dir_path: str,
               filename_prefix: str) -> list[dict]:
    """One entry per (historic file x matching instance): run_id plus the
    staging info (``mvHistADCIRCFiles.py:135-170``)."""
    out = []
    for path in sorted(glob(os.path.join(dir_path, filename_prefix))):
        hf = parse_hist_filename(os.path.basename(path))
        instance_ids = [r[0] for r in (
            config_items.filter(F.col("uid") == hf.uid)
            .select("instance_id").distinct().collect())]
        for iid in instance_ids:
            run_id = f"{iid}-{hf.uid}"
            try:
                props = get_adcirc_run_property_variables(config_items, run_id)
            except KeyError:
                continue
            if props.get("suite.model") != "adcirc":
                continue
            storm_ok = (hf.storm == props.get("storm")
                        if props.get("storm") not in (None, "none", "None")
                        else True)
            if (storm_ok and props.get("physical_location") == hf.physical_location
                    and (props.get("ADCIRCgrid") or "").upper() == hf.grid):
                out.append({"run_id": run_id, "dir_path": dir_path,
                            "file_name": hf.file_name,
                            "station_type": hf.station_type})
    return out


def stage_run_directories(run_files: list[dict]) -> list[str]:
    """Copy each matched forecast file (+ its ``meta_`` twin and NOWCAST
    counterparts when present) into ``<dir>/<run_id>/`` under canonical
    names (``mvHistADCIRCFiles.py:171-230``). Returns staged run dirs."""
    staged = []
    for row in run_files:
        run_dir = os.path.join(row["dir_path"], row["run_id"])
        os.makedirs(run_dir, exist_ok=True)
        st = row["station_type"]
        src = os.path.join(row["dir_path"], row["file_name"])
        shutil.copyfile(src, os.path.join(run_dir, f"FORECAST_{st}.csv"))

        parts = row["file_name"].split("_")
        meta_name = "_".join([parts[0], "meta", *parts[1:]])
        meta_src = os.path.join(row["dir_path"], meta_name)
        if os.path.exists(meta_src):
            shutil.copyfile(meta_src, os.path.join(run_dir, f"meta_FORECAST_{st}.csv"))

        # NOWCAST twin: swap ensemble + marker, wildcard the run datetime
        parts = row["file_name"].split("_")
        ens_idx = 4 if parts[1] == "coamps" else 3
        parts[ens_idx] = "NOWCAST"
        parts[-5] = "NOWCAST"
        parts[-1] = parts[-2] + ".csv"
        parts[-2] = "*"
        # sorted + first-match-only: several nowcast files can match the
        # wildcarded run datetime, and each staged copy overwrites the
        # same NOWCAST_<TYPE>.csv target — glob order is filesystem-
        # dependent, so pin the lexicographically-first (earliest
        # datetime) match deterministically
        for nowcast_path in sorted(glob(os.path.join(row["dir_path"], "_".join(parts)))):
            nowcast_name = os.path.basename(nowcast_path)
            shutil.copyfile(nowcast_path, os.path.join(run_dir, f"NOWCAST_{st}.csv"))
            nparts = nowcast_name.split("_")
            nmeta = "_".join([nparts[0], "meta", *nparts[1:]])
            nmeta_src = os.path.join(row["dir_path"], nmeta)
            if os.path.exists(nmeta_src):
                shutil.copyfile(nmeta_src, os.path.join(run_dir, f"meta_NOWCAST_{st}.csv"))
            break
        staged.append(run_dir)
    return staged
