"""Pytest tier of the high-volume streaming certification: the same harness
and assertions as scripts/stream_volume_cert.py (exact no-lost-row parity,
watermark late-row drops, bounded session state), at a size that keeps CI
fast.  The full ~2M-row run is recorded in SCALE_stream.json."""

from __future__ import annotations

import shutil
import tempfile

from ad_hoc_olap_query_processing_engine_spark.streaming import volume_cert as vc


def test_stream_volume_cert_small(spark):
    data_dir = tempfile.mkdtemp(prefix="stream_vol_test_")
    try:
        gen = vc.generate_stream_files(
            data_dir, n_files=8, n_users=100, events_per_user=10, n_late_users=75
        )
        session = vc.session_volume_cert(spark, data_dir, gen)
        stateful = vc.stateful_volume_cert(spark, data_dir, gen)
        # the certs assert internally; re-pin the headline properties here so
        # a weakened cert can't silently pass
        assert session["verdict"] == "PASS"
        assert session["rows_dropped_by_watermark"] == gen["n_late_rows"] > 0
        assert session["sessions_diff"] == 0
        assert session["peak_state_rows"] < gen["n_real_sessions"]
        assert stateful["verdict"] == "PASS"
        assert stateful["users_diff"] == 0
    finally:
        shutil.rmtree(data_dir, ignore_errors=True)


def test_stream_stream_join_volume_cert_small(spark):
    left = tempfile.mkdtemp(prefix="stream_join_l_")
    right = tempfile.mkdtemp(prefix="stream_join_r_")
    try:
        gen = vc.generate_join_stream_files(
            left, right, n_files=8, imps_per_file=600, late_per_file=20
        )
        report = vc.join_volume_cert(spark, left, right, gen)
        # re-pin the headline properties so a weakened cert can't pass
        assert report["verdict"] == "PASS"
        assert report["rows_input"] == gen["n_rows"]
        assert report["rows_dropped_by_watermark"] == gen["n_late_clicks"] > 0
        assert report["rows_diff"] == 0
        assert report["null_matches_emitted"] == report["null_matches_expected"] > 0
        # two-sided state must be a fraction of the rows streamed
        assert report["peak_state_rows"] < gen["n_rows"] // 2
    finally:
        shutil.rmtree(left, ignore_errors=True)
        shutil.rmtree(right, ignore_errors=True)
