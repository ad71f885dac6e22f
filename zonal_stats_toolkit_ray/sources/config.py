"""Config-driven multi-job runs: INI parsing with the reference's validation
rules (``/root/reference/runner.py:87-261``), adapted to the engine's data
model (zones Parquet instead of an OGR vector, tiles Parquet globs instead
of GeoTIFF globs).

Parity rules kept:
* file layout: ``[project]`` + N × ``[job:<tag>]`` sections (INI syntax —
  the reference's configs are INI despite the ``.yml`` extension)
* ``[project].name`` must equal the config file stem (``runner.py:134-138``)
* ``global_work_dir`` / ``global_output_dir`` required (``runner.py:146-147``)
* duplicate job tags rejected (``runner.py:159-166``)
* ``base_raster_pattern`` = comma-separated glob list, each pattern must
  match ≥1 file (``runner.py:178-192``)
* operations validated against VALID_OPERATIONS + arbitrary ``pN``
  (``runner.py:198-212``)
* ``agg_field`` must exist in the zones schema (``runner.py:214-233``)
* ``row_col_order`` is required (``runner.py:248``)
"""

from __future__ import annotations

import configparser
import glob
from pathlib import Path

from ..functions.scalars import parse_operations


class ConfigError(ValueError):
    pass


def parse_and_validate_config(cfg_path: str | Path) -> dict:
    cfg_path = Path(cfg_path)
    if not cfg_path.exists():
        raise ConfigError(f"config not found: {cfg_path}")
    cp = configparser.ConfigParser()
    try:
        cp.read(cfg_path)
    except configparser.DuplicateSectionError as e:
        # duplicate [job:X] tags rejected (runner.py:159-166)
        raise ConfigError(f"duplicate job tag: {e.section}") from e
    except configparser.Error as e:
        raise ConfigError(str(e)) from e

    if "project" not in cp:
        raise ConfigError("missing [project] section")
    project = dict(cp["project"])
    name = project.get("name")
    if name != cfg_path.stem:
        raise ConfigError(
            f"[project].name ({name!r}) must equal the config file stem "
            f"({cfg_path.stem!r})"
        )
    for req in ("global_work_dir", "global_output_dir"):
        if req not in project:
            raise ConfigError(f"[project].{req} is required")

    job_list = []
    seen_tags = set()
    for section in cp.sections():
        if not section.startswith("job:"):
            continue
        tag = section.split(":", 1)[1]
        if tag in seen_tags:
            raise ConfigError(f"duplicate job tag: {tag}")
        seen_tags.add(tag)
        job = dict(cp[section])

        for req in ("agg_vector", "agg_field", "operations", "row_col_order",
                    "base_raster_pattern"):
            if req not in job:
                raise ConfigError(f"[{section}].{req} is required")

        agg_vector = Path(job["agg_vector"])
        if not agg_vector.exists():
            raise ConfigError(f"[{section}].agg_vector not found: {agg_vector}")
        # schema introspection (reference uses fiona.listlayers/src.schema)
        import pyarrow.parquet as pq

        schema = pq.read_schema(agg_vector)
        if job["agg_field"] not in schema.names and job["agg_field"] != "group_value":
            raise ConfigError(
                f"[{section}].agg_field {job['agg_field']!r} not in zones schema "
                f"{schema.names}"
            )

        patterns = [p.strip() for p in job["base_raster_pattern"].split(",") if p.strip()]
        raster_paths: list[str] = []
        for pat in patterns:
            hits = sorted(glob.glob(pat))
            if not hits:
                raise ConfigError(f"[{section}] pattern matched no files: {pat}")
            raster_paths.extend(hits)

        ops = [o.strip() for o in job["operations"].split(",") if o.strip()]
        norm_ops, plist = parse_operations(ops)  # raises on invalid tokens

        if job["row_col_order"].replace(" ", "") not in (
            "agg_field,base_raster",
            "base_raster,agg_field",
        ):
            raise ConfigError(f"[{section}].row_col_order invalid: {job['row_col_order']}")

        job_list.append(
            {
                "tag": tag,
                "agg_vector": str(agg_vector),
                "agg_field": job["agg_field"],
                "base_raster_path_list": raster_paths,
                "operations": norm_ops,
                "percentile_list": plist,
                "row_col_order": job["row_col_order"],
                "workdir": str(Path(project["global_work_dir"]) / tag),
                "output_csv": str(
                    Path(project["global_output_dir"]) / f"{tag}.csv"
                ),
            }
        )
    if not job_list:
        raise ConfigError("no [job:*] sections")
    return {"project": project, "job_list": job_list}
