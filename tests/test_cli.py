"""`python -m edkray` job entrypoint (the `ray job submit` surface):
arg plumbing, metrics JSON on stdout, resume-by-default semantics."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest


class TestCli:
    def test_runs_pipeline_and_prints_metrics(self, ray_session, fixture_dir, tmp_path, capsys):
        from edkray.__main__ import main

        out = str(tmp_path / "out")
        rc = main([
            "--pages", os.path.join(fixture_dir, "pages.parquet"),
            "--out", out,
            "--admin", os.path.join(fixture_dir, "admin.parquet"),
            "--num-partitions", "4",
        ])
        assert rc == 0
        metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert metrics["rows_written_this_run"] > 0
        assert metrics["partitions_processed"] == 4
        pages = pq.read_table(os.path.join(out, "pages"))
        assert pages.num_rows == metrics["rows_written_this_run"]
        assert pq.read_table(os.path.join(out, "assignments")).num_rows > 0
        # no kNN stage requested -> no neighbor column in pages output
        assert "neighbor_ids" not in pages.schema.names

    def test_resume_is_noop_after_complete_run(self, ray_session, fixture_dir, tmp_path, capsys):
        from edkray.__main__ import main

        out = str(tmp_path / "out")
        args = [
            "--pages", os.path.join(fixture_dir, "pages.parquet"),
            "--out", out,
            "--admin", os.path.join(fixture_dir, "admin.parquet"),
            "--num-partitions", "4",
        ]
        main(args)
        first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        main(args)  # resumed: all partitions done -> returns stored metrics
        second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert second["rows_written_this_run"] == first["rows_written_this_run"]

    def test_bad_dedup_mode_rejected(self):
        from edkray.__main__ import main

        with pytest.raises(SystemExit):
            main(["--pages", "x", "--out", "y", "--dedup-mode", "bogus"])
