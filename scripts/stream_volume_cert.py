"""High-volume streaming certification run → SCALE_stream.json.

Generates a deterministic multi-file event stream (default ~2M rows, 41
micro-batches) and drives the two stateful surfaces through real watermark
pressure; see ad_hoc_olap_query_processing_engine_spark/streaming/volume_cert.py
for the asserted properties.

Usage: python scripts/stream_volume_cert.py [n_files n_users events_per_user]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ad_hoc_olap_query_processing_engine_spark.session import get_spark
from ad_hoc_olap_query_processing_engine_spark.streaming import volume_cert as vc


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    n_users = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    events = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    spark = get_spark(app_name="stream_volume_cert", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    data_dir = tempfile.mkdtemp(prefix="stream_vol_")
    try:
        t0 = time.time()
        gen = vc.generate_stream_files(
            data_dir, n_files=n_files, n_users=n_users, events_per_user=events
        )
        t_gen = round(time.time() - t0, 1)
        t0 = time.time()
        session = vc.session_volume_cert(spark, data_dir, gen)
        t_sess = round(time.time() - t0, 1)
        t0 = time.time()
        stateful = vc.stateful_volume_cert(spark, data_dir, gen)
        t_state = round(time.time() - t0, 1)
        # stream-stream ranged left-outer join (round-9 verdict ask #2):
        # sized so the join pass alone streams ~1.5M rows
        left = tempfile.mkdtemp(prefix="stream_join_l_")
        right = tempfile.mkdtemp(prefix="stream_join_r_")
        try:
            t0 = time.time()
            jgen = vc.generate_join_stream_files(
                left, right, n_files=n_files, imps_per_file=25_000
            )
            t_jgen = round(time.time() - t0, 1)
            t0 = time.time()
            join = vc.join_volume_cert(spark, left, right, jgen)
            t_join = round(time.time() - t0, 1)
        finally:
            shutil.rmtree(left, ignore_errors=True)
            shutil.rmtree(right, ignore_errors=True)
        out = {
            "metric": "stream_volume_cert",
            "generated": gen,
            "gen_sec": t_gen,
            "session_cert": {**session, "sec": t_sess},
            "stateful_cert": {**stateful, "sec": t_state},
            "join_generated": jgen,
            "join_gen_sec": t_jgen,
            "join_cert": {**join, "sec": t_join},
        }
        # the repo root is one level up from scripts/
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALE_stream.json",
        )
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(data_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
