"""ADCIRC model-run ingest — ``runModelIngest --inputTask SequenceIngest``
(SURVEY section 3.2) as one parameterized batch job.

Per run directory ``<harvest_dir>/<model_run_id>/`` containing
``FORECAST_<STATIONTYPE>.csv`` / ``NOWCAST_<STATIONTYPE>.csv``:

1. run properties fetched via the X5 pivot (plans.dashboard_meta)
2. timemark derived from ``'20'+time.currentdate`` + cycle hour (F3,
   ``run/runModelIngest.py:186-187``)
3. per file: data_source / filename_prefix derived from storm-vs-synoptic
   naming (F6, ``run/runModelIngest.py:201-212``), station-type suffix
   mapped to variable/location/units (``run/runModelIngest.py:215-238``)
4. unseen (filename_prefix, source_instance) sources auto-registered into
   source_model_meta + model_source (J8 + M1,
   ``run/runModelIngest.py:243-261``) — an idempotent dimension upsert
5. data merged into model_data keyed (source_id, timemark, time): multiple
   runs coexist per timemark; reruns of the same run keep the latest load
   (``run/ingestModelTasks.py:102-114,375-383``)
6. harvest ledger rows appended + flipped (M2)
"""

from __future__ import annotations

import datetime as dt
import os
from glob import glob

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import HARVEST_MODEL_FILE_META, MODEL_DATA, SOURCE_MODEL_META
from ..sources.catalog import Catalog
from ..sources.harvest_csv import read_harvest_csv
from .bootstrap import source_key
from .dashboard_meta import get_adcirc_run_property_variables

LEDGER = "harvest_model_file_meta"
FACT = "model_data"

#: station-type suffix → (source_variable, location_type, units)
#: (run/runModelIngest.py:215-238)
STATION_TYPES = {
    "NOAASTATIONS": ("water_level", "tidal", "m"),
    "CONTRAILSCOASTAL": ("water_level", "coastal", "m"),
    "CONTRAILSRIVERS": ("water_level", "river", "m"),
    "NDBCBUOYS": ("wave_height", "ocean", "m"),
}


def derive_timemark(time_currentdate: str, time_currentcycle: str) -> dt.datetime:
    """F3: '20'+yymmdd + cycle hour → run start timestamp
    (run/runModelIngest.py:186-187)."""
    return dt.datetime(int("20" + time_currentdate[0:2]), int(time_currentdate[2:4]),
                       int(time_currentdate[4:6]), int(time_currentcycle))


def derive_source(run_props: dict, kind: str, station_type: str) -> dict:
    """F6: data_source / filename_prefix naming for FORECAST/NOWCAST files,
    synoptic vs tropical (run/runModelIngest.py:201-212,294-299)."""
    grid = run_props["ADCIRCgrid"].upper()
    ens = run_props["forcing.ensemblename"]
    storm = run_props["storm"]
    synoptic = run_props["forcing.metclass"] == "synoptic"
    if kind == "FORECAST":
        data_source = (f"{ens.upper()}_{grid}" if synoptic
                       else f"{storm}_{ens.upper()}_{grid}")
        mid = ens.upper() if synoptic else ens
        prefix = (f"{run_props['suite.model']}_{storm}_"
                  f"{run_props['physical_location'].upper()}_{mid}_{grid}_FORECAST_{station_type}")
    else:
        data_source = (f"NOWCAST_{grid}" if synoptic else f"{storm}_NOWCAST_{grid}")
        prefix = (f"{run_props['suite.model']}_{storm}_"
                  f"{run_props['physical_location'].upper()}_NOWCAST_{grid}_NOWCAST_{station_type}")
    variable, location_type, units = STATION_TYPES[station_type]
    return {
        "data_source": data_source, "filename_prefix": prefix,
        "source_variable": variable, "location_type": location_type, "units": units,
        "source_name": run_props["suite.model"],
        "source_archive": run_props["physical_location"],
        "source_instance": run_props["instancename"],
        "forcing_metclass": run_props["forcing.metclass"],
    }


class ModelIngest:
    def __init__(self, spark: SparkSession, catalog: Catalog, harvest_dir: str,
                 *, ui_data_url: str = "https://apsviz/ui-data"):
        """``ui_data_url``: base URL of the station-data CSV service,
        recorded per run in the apsviz_station_file_meta ledger and used
        for per-station csvurl construction (the reference's
        ``UI_DATA_URL`` env var, ``run/runModelIngest.py:220,405``)."""
        self.spark = spark
        self.catalog = catalog
        self.harvest_dir = harvest_dir
        self.ui_data_url = ui_data_url

    def _register_source(self, src: dict) -> None:
        """Idempotent source auto-registration (J8+M1): add source meta and
        one model_source row per station of the matching location_type."""
        meta = self.catalog.read("source_model_meta", SOURCE_MODEL_META)
        if self.catalog.exists("source_model_meta"):
            seen = meta.filter(
                (F.col("filename_prefix") == src["filename_prefix"])
                & (F.col("source_instance") == src["source_instance"])).limit(1).count()
            if seen:
                return
        row = self.spark.createDataFrame(
            [[src[k] for k in ("data_source", "source_name", "source_archive",
                               "source_variable", "source_instance", "forcing_metclass",
                               "filename_prefix", "location_type", "units")]],
            "data_source string, source_name string, source_archive string, "
            "source_variable string, source_instance string, forcing_metclass string, "
            "filename_prefix string, location_type string, units string")
        self.catalog.append(row, "source_model_meta")

        stations = (self.catalog.read("gauge_station")
                    .filter(F.col("location_type") == src["location_type"]))
        model_source = stations.select(
            source_key(F.col("station_name"), F.lit(src["data_source"]),
                       F.lit(src["source_name"]), F.lit(src["source_archive"]))
            .alias("source_id"),
            "station_id",
            F.lit(src["data_source"]).alias("data_source"),
            F.lit(src["source_name"]).alias("source_name"),
            F.lit(src["source_archive"]).alias("source_archive"),
            F.lit(src["source_instance"]).alias("source_instance"),
            F.lit(src["forcing_metclass"]).alias("forcing_metclass"),
            F.lit(src["units"]).alias("units"),
        )
        self.catalog.append(model_source, "model_source")

    def ingest_run(self, model_run_id: str, config_items: DataFrame) -> dict:
        """Ingest one model run directory end-to-end."""
        props = get_adcirc_run_property_variables(config_items, model_run_id)
        timemark = derive_timemark(props["time.currentdate"], props["time.currentcycle"])
        run_dir = os.path.join(self.harvest_dir, model_run_id)

        files = []
        for kind in ("FORECAST", "NOWCAST"):
            for path in sorted(glob(os.path.join(run_dir, f"{kind}_*.csv"))):
                station_type = os.path.basename(path).split("_")[-1].split(".")[0]
                if station_type not in STATION_TYPES:
                    continue
                src = derive_source(props, kind, station_type)
                files.append((path, kind, src))
        if not files:
            return {"files": 0, "rows": 0, "station_files": 0}

        for _, _, src in files:
            self._register_source(src)

        processing = dt.datetime.now().replace(microsecond=0)
        batch = None
        ledger_rows = []
        windows = {}
        for path, kind, src in files:
            name = os.path.basename(path)
            raw = read_harvest_csv(self.spark, [path], "water_level")
            w = raw.agg(F.min("time").alias("lo"), F.max("time").alias("hi")).first()
            windows[name] = (w["lo"], w["hi"])
            df = (
                raw
                .withColumn("timemark", F.lit(timemark).cast("timestamp_ntz"))
                .join(F.broadcast(
                    self.catalog.read("model_source")
                    .filter((F.col("data_source") == src["data_source"])
                            & (F.col("source_name") == src["source_name"])
                            & (F.col("source_archive") == src["source_archive"])
                            & (F.col("source_instance") == src["source_instance"])
                            & (F.col("forcing_metclass") == src["forcing_metclass"]))
                    .join(self.catalog.read("gauge_station")
                          .select("station_id", "station_name"), "station_id")
                    .select("station_name", "source_id")), "station_name")
                .select("source_id", "timemark", "time",
                        "water_level", F.lit(None).cast("double").alias("wave_height"),
                        F.lit(processing).cast("timestamp_ntz").alias("__proc_dt"))
            )
            batch = df if batch is None else batch.unionByName(df)
            ledger_rows.append({
                "dir_path": run_dir, "file_name": name, "model_run_id": model_run_id,
                "processing_datetime": processing, "data_date_time": timemark,
                "data_begin_time": windows[name][0], "data_end_time": windows[name][1],
                "data_source": src["data_source"], "source_name": src["source_name"],
                "source_archive": src["source_archive"],
                "source_instance": src["source_instance"],
                "forcing_metclass": src["forcing_metclass"],
                "advisory": props["advisory"], "timemark": timemark,
                "ingested": True, "overlap_past_file_date_time": False,
            })

        batch = batch.filter(F.col("time").isNotNull())
        n_rows = batch.count()
        # rerun dedup (run/ingestModelTasks.py:102-114): key includes
        # timemark so runs coexist; latest processing wins on rerun
        self.catalog.merge_keep_latest(
            FACT, batch, keys=["source_id", "timemark", "time"],
            order_by=["__proc_dt"],
            time_col="time", drop_before_write=["__proc_dt"],
        )

        entries = self.spark.createDataFrame(
            [[r[f.name] for f in HARVEST_MODEL_FILE_META.fields] for r in ledger_rows],
            HARVEST_MODEL_FILE_META)
        self.catalog.append(entries, LEDGER)

        published = self.publish_stations(model_run_id, props, timemark)
        return {"files": len(files), "rows": n_rows, "station_files": published}

    def publish_stations(self, model_run_id: str, props: dict,
                         timemark: dt.datetime) -> int:
        """ApsViz station publish from ``meta_FORECAST_*.csv`` station
        lists (``run/runModelIngest.py:375-396`` →
        ``createIngestApsVizStationData``), with the
        drf_apsviz_station_file_meta ledger. Returns files processed."""
        from ..schemas import APSVIZ_STATION_FILE_META
        from .apsviz_stations import publish_apsviz_stations

        run_dir = os.path.join(self.harvest_dir, model_run_id)
        meta_files = sorted(glob(os.path.join(run_dir, "meta_FORECAST_*.csv")))
        if not meta_files:
            return 0
        # per-RUN ledger probe (reference parity:
        # run/runModelIngest.py:90-94 queries the meta table by its
        # instance/run identifiers): the driver set stays O(run), never
        # O(history) — years of accumulated runs cost this collect
        # nothing (r6 verdict task 4). read_equals adds Bloom/zone-map
        # FILE skipping whenever the deployment built a sidecar on
        # model_run_id (build_skipping(equality_cols=["model_run_id"]))
        # and degrades to the plain filtered read otherwise (r6 verdict
        # task 7: the skipping layer serves the ledger probe too).
        if self.catalog.exists("apsviz_station_file_meta"):
            from ..sources.skipping import read_equals

            probe = read_equals(self.catalog, "apsviz_station_file_meta",
                                "model_run_id", [model_run_id])
        else:
            probe = self.catalog.read("apsviz_station_file_meta",
                                      APSVIZ_STATION_FILE_META).filter(
                F.col("model_run_id") == model_run_id)
        seen = {r.file_name for r in probe.select("file_name").collect()}

        by_type = {}
        for path in meta_files:
            station_type = os.path.basename(path).split("_")[-1].split(".")[0]
            if station_type in STATION_TYPES:
                by_type[station_type] = path
        all_location_types = [STATION_TYPES[t][1] for t in by_type]

        entries = []
        for station_type, path in by_type.items():
            name = os.path.basename(path)
            if name in seen:
                continue
            src = derive_source(props, "FORECAST", station_type)
            stations_df = self.spark.read.option("header", True).csv(path)
            station_col = next(c for c in stations_df.columns if c.lower() == "station")
            station_names = [r[0] for r in stations_df.select(station_col).collect()]
            publish_apsviz_stations(
                self.spark, self.catalog, model_run_id=model_run_id,
                adcirc_station_names=station_names,
                data_source=src["data_source"], source_name=src["source_name"],
                source_archive=src["source_archive"],
                source_instance=src["source_instance"],
                forcing_metclass=src["forcing_metclass"],
                location_type=src["location_type"],
                grid_name=props["ADCIRCgrid"].upper(), timemark=timemark,
                all_location_types=all_location_types,
                ui_data_url=self.ui_data_url)
            # per-run csvurl ledger row (run/runModelIngest.py:405 passes
            # UI_DATA_URL per meta file; independently queryable here)
            entries.append([run_dir, name, timemark, src["data_source"],
                            src["source_name"], src["source_archive"],
                            src["source_instance"], src["forcing_metclass"],
                            props["ADCIRCgrid"].upper(), model_run_id, timemark,
                            src["location_type"], self.ui_data_url, True])
        if entries:
            self.catalog.append(
                self.spark.createDataFrame(entries, APSVIZ_STATION_FILE_META),
                "apsviz_station_file_meta")
        return len(entries)

    def cleanup_run_dir(self, model_run_id: str) -> bool:
        """M5 model-path parity: the reference removes the per-run ingest
        directory after a successful run (``run/runModelIngest.py:575-580``,
        ``shutil.rmtree(ingestPath)``). Removes
        ``<harvest_dir>/<model_run_id>/`` only when every file the run
        ledgered is flipped ``ingested=True`` — a crashed run keeps its
        staging dir for replay, and a rerun after cleanup is a no-op.
        Returns whether the directory was removed."""
        import shutil

        run_dir = os.path.join(self.harvest_dir, model_run_id)
        if not os.path.isdir(run_dir):
            return False
        ledger = self.catalog.read(LEDGER, HARVEST_MODEL_FILE_META)
        pending = (ledger.filter((F.col("dir_path") == run_dir)
                                 & ~F.col("ingested"))
                   .limit(1).count())
        if pending:
            return False
        shutil.rmtree(run_dir)
        return True

    def model_data(self) -> DataFrame:
        return self.catalog.read(FACT, MODEL_DATA)
