"""Exact DBSCAN, Spark-distributed per spatial tile (SURVEY §2 D3).

Reference parity: cluster.py:33-60 collects EVERY point to the driver
and runs sklearn DBSCAN with a haversine metric — O(n²) memory on one
machine, a non-starter at 100 TB. Here the plane is cut into tiles of
side `tile_deg`, each point is assigned to its tile plus ghost copies
in any neighbor tile within `eps_deg` of the boundary, and an exact
DBSCAN runs per tile inside `applyInPandas` (Arrow-batched, pure
numpy — no sklearn dependency).

Scale notes (100 TB):
- One shuffle, keyed by tile id. Worker memory is bounded by the
  densest tile, not the corpus: choose tile_deg so a tile holds ~1e5
  points (the per-tile DBSCAN is O(n_tile²) distance checks done
  block-wise in numpy).
- Ghost margin (eps) means border clusters are seen whole by at least
  one tile; ghost points are flagged and dropped from the output so
  each point is labeled exactly once (by its home tile).
- Cluster ids are made globally unique by prefixing the tile id — no
  driver-side coordination, no second pass. (A cross-tile merge pass —
  union-find on clusters sharing ghost core points — is the standard
  extension; per-tile labels are what the reference's single-node run
  produces per region.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DBSCAN_SCHEMA = StructType(
    [
        StructField("point_id", StringType()),
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("cluster_id", StringType()),  # "<tile>#<local>" or None (noise)
        StructField("tile_id", StringType()),
        StructField("n_neighbors", LongType()),
    ]
)


def _dbscan_numpy(
    lat: np.ndarray,
    lon: np.ndarray,
    eps: float,
    min_samples: float,
    weights: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Plain-euclidean-on-degrees DBSCAN; returns (labels, n_neighbors).

    Labels: -1 noise, else 0..k. Block-wise pairwise distances keep the
    memory to O(block · n) instead of O(n²) at once. With `weights`, a
    point is core when the SUM of its neighbors' weights (incl. itself)
    reaches min_samples — sklearn's sample_weight semantics, which the
    reference's second, severity-weighted DBSCAN used (cluster.py).
    """
    n = len(lat)
    pts = np.stack([lat, lon], axis=1)
    neighbors: list[np.ndarray] = []
    block = 2048
    for start in range(0, n, block):
        chunk = pts[start : start + block]
        d2 = ((chunk[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2)
        for row in d2 <= eps * eps:
            neighbors.append(np.flatnonzero(row))
    n_nbrs = np.array([len(x) for x in neighbors], dtype=np.int64)
    if weights is None:
        core = n_nbrs >= min_samples
    else:
        core = (
            np.array([weights[nb].sum() for nb in neighbors]) >= min_samples
        )

    labels = np.full(n, -1, dtype=np.int64)
    cluster = 0
    for seed in range(n):
        if labels[seed] != -1 or not core[seed]:
            continue
        # BFS flood-fill from the core seed
        labels[seed] = cluster
        frontier = [seed]
        while frontier:
            cur = frontier.pop()
            if not core[cur]:
                continue
            for nb in neighbors[cur]:
                if labels[nb] == -1:
                    labels[nb] = cluster
                    frontier.append(nb)
        cluster += 1
    return labels, n_nbrs


def dbscan_tiles(
    points: DataFrame,
    eps_deg: float = 0.5,
    min_samples: float = 5,
    tile_deg: float = 10.0,
    weight_col: str | None = None,
) -> DataFrame:
    """Distributed exact DBSCAN over (point_id, lat, lon).

    `points` must have columns point_id (string), lat, lon (double),
    plus `weight_col` if given (severity-weighted variant). Returns one
    row per input point with its cluster label (None = noise), labeled
    by its home tile.
    """
    if eps_deg * 2 >= tile_deg:
        raise ValueError("tile_deg must exceed 2*eps_deg for ghost margins")

    tx = F.floor(F.col("lon") / tile_deg).cast("long")
    ty = F.floor(F.col("lat") / tile_deg).cast("long")
    wcol = (
        F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    ).alias("w")
    base = points.select(
        "point_id",
        F.col("lat").cast("double").alias("lat"),
        F.col("lon").cast("double").alias("lon"),
        wcol,
        tx.alias("tx"),
        ty.alias("ty"),
    )

    # Ghost replication: a point within eps of a tile edge also joins
    # the neighboring tile so border clusters are seen whole there.
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    replicas = []
    for dx, dy in offsets:
        rep = base.withColumn("rtx", F.col("tx") + dx).withColumn(
            "rty", F.col("ty") + dy
        )
        if (dx, dy) != (0, 0):
            # keep only points whose coordinate lies within eps of the
            # replica tile's bounding box
            rep = rep.where(
                (F.col("lon") >= F.col("rtx") * tile_deg - eps_deg)
                & (F.col("lon") < (F.col("rtx") + 1) * tile_deg + eps_deg)
                & (F.col("lat") >= F.col("rty") * tile_deg - eps_deg)
                & (F.col("lat") < (F.col("rty") + 1) * tile_deg + eps_deg)
            )
        replicas.append(
            rep.select(
                "point_id",
                "lat",
                "lon",
                "w",
                F.concat_ws("_", "rtx", "rty").alias("tile_id"),
                ((F.col("rtx") == F.col("tx")) & (F.col("rty") == F.col("ty")))
                .alias("is_home"),
            )
        )
    tiled = replicas[0]
    for rep in replicas[1:]:
        tiled = tiled.unionByName(rep)

    def run_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        labels, n_nbrs = _dbscan_numpy(
            pdf["lat"].to_numpy(),
            pdf["lon"].to_numpy(),
            eps_deg,
            min_samples,
            weights=pdf["w"].to_numpy() if weight_col else None,
        )
        tile = pdf["tile_id"].iloc[0]
        out = pdf[pdf["is_home"]].copy()
        mask = pdf["is_home"].to_numpy()
        home_labels = labels[mask]
        out["cluster_id"] = [
            f"{tile}#{l}" if l >= 0 else None for l in home_labels
        ]
        out["tile_id"] = tile
        out["n_neighbors"] = n_nbrs[mask]
        return out[
            ["point_id", "lat", "lon", "cluster_id", "tile_id", "n_neighbors"]
        ]

    return tiled.groupBy("tile_id").applyInPandas(run_tile, DBSCAN_SCHEMA)
