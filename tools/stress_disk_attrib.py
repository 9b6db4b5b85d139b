"""Attribute the LSH pair kernel's org10 -> org30 WALL super-linearity
(r8 verdict item 4): the r8 soak measured byte exponent 0.98 but wall
exponent 1.77 across that span and blamed single-box disk saturation
(shuffle + DISK_ONLY checkpoint traffic competing for one device). This
tool turns that attribution into a measurement:

* per corpus point it runs ``lsh_verified_jaccard_pairs`` once and
  samples ``/proc/diskstats`` for the device backing the shuffle/
  checkpoint dirs before and after — the kernel's DELTA of sectors
  read/written and, decisively, **io-ticks (ms the device was busy)**.
  busy_frac = io_busy_ms / wall_ms: if the device approaches 1.0 at
  org30 while org10 has headroom, the extra wall is queueing on the
  disk, not extra work — exactly the claimed attribution (on a cluster
  the same bytes spread over N disks and the bytes row predicts cost).
* it also reports Spark's own spill counters (memory/diskBytesSpilled
  summed over the run's stages) so checkpoint+shuffle traffic and spill
  are separated.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/stress_disk_attrib.py \
    [sf_dir] [workdir] [mults_csv]   (defaults sf0.1, /tmp/soak, "10,30")
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from build_stress import build  # noqa: E402
from stress_soak import force_full  # noqa: E402

_SECTOR = 512


def _disk_totals() -> dict[str, dict]:
    """Per-device cumulative counters from /proc/diskstats: sectors
    read/written and io-ticks ms (field 13 — time the device had I/O in
    flight). Whole devices only (skip partitions to avoid double count)."""
    out = {}
    with open("/proc/diskstats") as f:
        for line in f:
            p = line.split()
            name = p[2]
            if name.startswith(("loop", "ram")) or name[-1].isdigit():
                continue
            out[name] = {
                "rd_mb": int(p[5]) * _SECTOR / 1e6,
                "wr_mb": int(p[9]) * _SECTOR / 1e6,
                "busy_ms": int(p[12]),
            }
    return out


def _spill_totals(spark) -> tuple[float, float]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages) / 1e6
    dsk = sum(s.get("diskBytesSpilled", 0) for s in stages) / 1e6
    return round(mem, 1), round(dsk, 1)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak"
    mults = (
        tuple(int(m) for m in sys.argv[3].split(","))
        if len(sys.argv) > 3
        else (10, 30)
    )

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.text import (
        tokens,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.dedup import (
        lsh_verified_jaccard_pairs,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark

    spark = get_spark(
        "stress-disk-attrib",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",
            "spark.ui.retainedStages": "20000",
            "spark.ui.retainedJobs": "20000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    for mult in mults:
        corpus = os.path.join(work, f"org{mult}")
        if not os.path.exists(os.path.join(corpus, "documents.parquet")):
            t0 = time.time()
            nd, _ = build(sf_dir, corpus, copies=1, shards=20 * mult)
            print(f"built {corpus}: {nd} docs [{time.time()-t0:.0f}s]")
        docs = (
            spark.read.parquet(os.path.join(corpus, "documents.parquet"))
            .select("doc_id", tokens("text").alias("ts"))
        )
        spill0 = _spill_totals(spark)
        d0 = _disk_totals()
        t0 = time.time()
        n = force_full(lsh_verified_jaccard_pairs(docs, threshold=0.5))["n"]
        wall = time.time() - t0
        time.sleep(3)  # listener-bus drain, same discipline as measure()
        d1 = _disk_totals()
        spill1 = _spill_totals(spark)

        print(f"== lsh_verified org{mult}: wall {wall:.1f}s, {n} pairs ==")
        for dev in sorted(d1):
            if dev not in d0:
                continue
            rd = d1[dev]["rd_mb"] - d0[dev]["rd_mb"]
            wr = d1[dev]["wr_mb"] - d0[dev]["wr_mb"]
            busy = d1[dev]["busy_ms"] - d0[dev]["busy_ms"]
            if rd + wr < 1 and busy < 100:
                continue
            print(
                f"  {dev}: disk rd/wr {rd:.0f}/{wr:.0f} MB, "
                f"io-busy {busy/1000:.1f}s, busy_frac {busy/1000/wall:.2f}"
            )
        print(
            f"  spark spill mem/disk {spill1[0]-spill0[0]:.1f}/"
            f"{spill1[1]-spill0[1]:.1f} MB"
        )


if __name__ == "__main__":
    main()
