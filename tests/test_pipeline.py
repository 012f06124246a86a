"""End-to-end flagship pipeline tests: golden oracle recompute (pandas,
no Ray), byte-identity of extracted text per url, deterministic ranks,
and checkpoint/resume semantics (SURVEY §5's golden-test strategy made
offline)."""

from __future__ import annotations

import datetime as dt
import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from edkray.fixtures import T0, T1, domain_lonlat, make_admin, make_knn_refs


def _oracle_assignments(pages: pd.DataFrame, admin) -> pd.DataFrame:
    """Slow, obviously-correct single-process recompute (pandas + the
    pure-numpy geo kernels, no Ray) of the pipeline's assignment table."""
    from edkray.geo.cells import quadcell
    from edkray.geo.pip import PolygonIndex, wkb_to_ring

    df = pages.copy()
    # dedup: first by (warc_ts, text) per url
    df = df.sort_values(["url", "warc_ts", "text"], kind="stable").drop_duplicates("url", keep="first")
    df["domain"] = df.url.str.extract(r"^[a-z0-9+.-]+://([^/]+)")[0]
    ll = df.domain.map(lambda d: domain_lonlat(d))
    df["lon"] = [x[0] for x in ll]
    df["lat"] = [x[1] for x in ll]
    # temporal bucket: drop outside [T0, T1)
    df = df[(df.warc_ts >= T0) & (df.warc_ts < T1)]
    df["date_bucket"] = df.warc_ts.dt.floor("D")
    # tile
    h = np.clip(np.floor((df.lon + 180.0) / 10.0), 0, 35).astype(int)
    v = np.floor((df.lat + 80.0) / 10.0).astype(int)
    in_grid = (df.lat >= -80.0) & (df.lat < 80.0)
    tile = (
        h.astype(str).str.zfill(2) + v.clip(0, 15).astype(str).str.zfill(2)
        + "_" + df.date_bucket.dt.strftime("%Y%m%d")
    )
    df["tile_id"] = tile.where(in_grid, None)
    df["cell_7"] = quadcell(df.lon.to_numpy(), df.lat.to_numpy(), 7)
    idx = PolygonIndex(admin["admin_id"].to_pylist(),
                       [wkb_to_ring(w) for w in admin["wkb_geometry"].to_pylist()])
    df["admin_id"] = idx.query(df.lon.to_numpy(), df.lat.to_numpy())
    df = df[df.tile_id.notna()]
    # deterministic rank: ascending (warc_ts, url) within tile
    df = df.sort_values(["tile_id", "warc_ts", "url"], kind="stable")
    df["rank"] = df.groupby("tile_id").cumcount()
    return df


@pytest.fixture(scope="module")
def pipeline_run(ray_session, fixture_dir, tmp_path_factory):
    from edkray.pipelines.spatial import run_spatial_pipeline

    out = str(tmp_path_factory.mktemp("flagship"))
    admin = make_admin()
    metrics = run_spatial_pipeline(
        os.path.join(fixture_dir, "pages.parquet"),
        admin=admin,
        out_dir=out,
        knn_refs=make_knn_refs(500),
        num_partitions=4,
        salt_threshold=60,  # the hot domain yields ~85 rows/daily-tile → salted
        resume=False,
    )
    return out, metrics, admin


class TestFlagship:
    def test_assignments_match_oracle(self, pipeline_run, fixture_dir):
        out, metrics, admin = pipeline_run
        got = pq.read_table(os.path.join(out, "assignments")).to_pandas()
        pages = pq.read_table(os.path.join(fixture_dir, "pages.parquet")).to_pandas()
        exp = _oracle_assignments(pages, admin)

        assert len(got) == len(exp)
        g = got.sort_values("url").reset_index(drop=True)
        e = exp.sort_values("url").reset_index(drop=True)
        assert (g.url.to_numpy() == e.url.to_numpy()).all()
        assert (g.tile_id.to_numpy() == e.tile_id.to_numpy()).all()
        assert (g.cell_7.to_numpy() == e.cell_7.to_numpy()).all()
        ga, ea = g.admin_id.to_numpy(), e.admin_id.to_numpy()
        assert all((a == b) or (pd.isna(a) and b is None) for a, b in zip(ga, ea))

    def test_ranks_are_dense_permutations(self, pipeline_run):
        out, _, _ = pipeline_run
        got = pq.read_table(os.path.join(out, "assignments")).to_pandas()
        for tile, grp in got.groupby("tile_id"):
            ranks = np.sort(grp["rank"].to_numpy())
            assert (ranks == np.arange(len(grp))).all(), tile

    def test_cold_tile_ranks_match_oracle_order(self, pipeline_run, fixture_dir):
        """Non-salted tiles must rank exactly by (warc_ts, url)."""
        out, metrics, admin = pipeline_run
        got = pq.read_table(os.path.join(out, "assignments")).to_pandas()
        pages = pq.read_table(os.path.join(fixture_dir, "pages.parquet")).to_pandas()
        exp = _oracle_assignments(pages, admin)
        hot = set(metrics.get("hot_tiles", []))
        cold = got[~got.tile_id.isin(hot)]
        m = cold.merge(exp[["url", "rank"]], on="url", suffixes=("", "_exp"))
        assert (m["rank"] == m["rank_exp"]).all()

    def test_hot_tiles_were_salted(self, pipeline_run):
        _, metrics, _ = pipeline_run
        assert len(metrics.get("hot_tiles", [])) >= 1  # the planted hot domain

    def test_text_byte_identity(self, pipeline_run, fixture_dir):
        """north_rule invariant: extracted text byte-identical per url."""
        out, _, _ = pipeline_run
        enriched = pq.read_table(os.path.join(out, "pages"), columns=["url", "text"]).to_pandas()
        orig = pq.read_table(os.path.join(fixture_dir, "pages.parquet"),
                             columns=["url", "text", "warc_ts"]).to_pandas()
        first = orig.sort_values(["url", "warc_ts", "text"], kind="stable").drop_duplicates("url")
        m = enriched.merge(first, on="url", suffixes=("_got", "_orig"))
        assert len(m) == len(enriched)
        ident = [
            a.encode() == b.encode() for a, b in zip(m.text_got, m.text_orig)
        ]
        assert all(ident)

    def test_knn_neighbors_exact(self, pipeline_run, fixture_dir):
        from edkray.geo.distance import knn_haversine

        out, _, _ = pipeline_run
        enriched = pq.read_table(
            os.path.join(out, "pages"), columns=["url", "lon", "lat", "neighbor_ids"]
        ).to_pandas().head(500)
        refs = make_knn_refs(500)
        idx, _ = knn_haversine(
            enriched.lon.to_numpy(), enriched.lat.to_numpy(),
            refs["lon"].to_numpy(), refs["lat"].to_numpy(), 3,
        )
        exp = [[refs["ref_id"][j].as_py() for j in row] for row in idx]
        assert [list(x) for x in enriched.neighbor_ids] == exp


class TestResume:
    def test_resume_skips_done_partitions(self, ray_session, fixture_dir, tmp_path_factory):
        from edkray.pipelines.manifest import RunManifest
        from edkray.pipelines.spatial import run_spatial_pipeline

        out = str(tmp_path_factory.mktemp("resume"))
        admin = make_admin()
        kwargs = dict(admin=admin, out_dir=out, num_partitions=4, resume=True)
        pages = os.path.join(fixture_dir, "pages.parquet")

        m1 = run_spatial_pipeline(pages, **kwargs)
        assert m1["partitions_processed"] == 4
        rows_full = m1["rows_written_this_run"]

        # simulate a kill after partition 0/1 completed: mark 2,3 not done
        # and delete their outputs (what purge_incomplete would see)
        manifest_path = os.path.join(out, "_manifest.json")
        raw = json.load(open(manifest_path))
        for p in ("2", "3"):
            raw["partitions"].pop(p, None)
        json.dump(raw, open(manifest_path, "w"))

        m2 = run_spatial_pipeline(pages, **kwargs)
        assert m2["partitions_processed"] == 2
        assert m2["partitions_skipped"] == 2

        # total output identical to a full run
        total = pq.read_table(os.path.join(out, "pages"), columns=["url"]).num_rows
        assert total == rows_full

    def test_fingerprint_mismatch_starts_fresh(self, tmp_path):
        from edkray.pipelines.manifest import RunManifest

        m = RunManifest.load(str(tmp_path), "fp1")
        m.mark_done(0, 10)
        m.save()
        again = RunManifest.load(str(tmp_path), "fp1")
        assert again.done_partitions() == {0}
        fresh = RunManifest.load(str(tmp_path), "fp2")
        assert fresh.done_partitions() == set()

    def test_purge_incomplete_removes_partials(self, tmp_path):
        from edkray.pipelines.manifest import RunManifest

        d = tmp_path / "data"
        (d / "part_id=0").mkdir(parents=True)
        (d / "part_id=1").mkdir(parents=True)
        (d / "part_id=1" / "x.parquet").write_bytes(b"partial")
        m = RunManifest.load(str(tmp_path), "fp")
        m.mark_done(0, 5)
        purged = m.purge_incomplete([str(d)], 2)
        assert purged == [1]
        assert (d / "part_id=0").exists() and not (d / "part_id=1").exists()


class TestNarrowDedup:
    def test_narrow_mode_matches_wide(self, ray_session, fixture_dir, tmp_path_factory):
        """The narrow (decision-shuffle + winner-filter) dedup produces
        the same assignments as the wide full-row shuffle on the
        fixture corpus (dup urls differ in warc_ts, so the
        (ts, text-hash) tiebreak coincides with (ts, text))."""
        import pyarrow.parquet as pq

        from edkray.pipelines.spatial import run_spatial_pipeline

        pages = os.path.join(fixture_dir, "pages.parquet")
        admin = make_admin()
        outs = {}
        # partitioned = the no-broadcast winner-key fallback forced on;
        # materialize = the single-decode read cache (r4) forced on
        variants = [("wide", "auto", "reread"), ("narrow", "broadcast", "reread"),
                    ("narrow", "partitioned", "reread"),
                    ("narrow", "broadcast", "materialize")]
        for mode, wk, rc in variants:
            out = str(tmp_path_factory.mktemp(f"dedup_{mode}_{wk}_{rc}"))
            run_spatial_pipeline(pages, admin=admin, out_dir=out,
                                 num_partitions=4, resume=False, dedup_mode=mode,
                                 wk_mode=wk, read_cache=rc)
            df = pq.read_table(os.path.join(out, "assignments")).to_pandas()
            outs[(mode, wk, rc)] = df.sort_values("url").reset_index(drop=True)
        a = outs[("wide", "auto", "reread")]
        for key in variants[1:]:
            b = outs[key]
            assert len(a) == len(b), key
            for col in ("url", "tile_id", "cell_7", "admin_id", "rank"):
                av, bv = a[col].to_numpy(), b[col].to_numpy()
                assert all((x == y) or (pd.isna(x) and pd.isna(y))
                           for x, y in zip(av, bv)), (key, col)

    def test_narrow_dedups_cross_block_identical_rows(self, ray_session, tmp_path_factory):
        """Fully identical (url, warc_ts, text) rows scattered across
        DIFFERENT blocks must still collapse to one row in narrow mode
        (round-2 fix: claim-registry actor for multi-copy winner keys)."""
        import pyarrow as pa

        from edkray.pipelines.spatial import run_spatial_pipeline

        rng = np.random.default_rng(7)
        base = dt.datetime(2017, 1, 2)
        rows = []
        for i in range(2000):
            rows.append((f"http://site{i % 40}.example/p{i}",
                         base + dt.timedelta(seconds=int(rng.integers(0, 86400 * 4))),
                         f"text body {i} " * 5, "en"))
        # 50 urls get 3 IDENTICAL copies each, scattered far apart so the
        # block-ranged read puts them in different blocks
        dup_rows = [(f"http://dupsite.example/d{j}", base + dt.timedelta(hours=j),
                     f"duplicated body {j} " * 5, "en") for j in range(50)]
        all_rows = dup_rows + rows[:1000] + dup_rows + rows[1000:] + dup_rows
        tbl = pa.table(
            {
                "url": pa.array([r[0] for r in all_rows]),
                "warc_ts": pa.array([r[1] for r in all_rows], type=pa.timestamp("us")),
                "text": pa.array([r[2] for r in all_rows]),
                "lang": pa.array([r[3] for r in all_rows]),
            }
        )
        src = str(tmp_path_factory.mktemp("dupsrc") / "pages.parquet")
        pq.write_table(tbl, src, row_group_size=200)  # many row groups -> many blocks
        admin = make_admin()
        counts = {}
        for mode, wk in (("wide", "auto"), ("narrow", "broadcast"), ("narrow", "partitioned")):
            out = str(tmp_path_factory.mktemp(f"dup_{mode}_{wk}"))
            run_spatial_pipeline(src, admin=admin, out_dir=out,
                                 num_partitions=4, resume=False, dedup_mode=mode,
                                 wk_mode=wk)
            df = pq.read_table(os.path.join(out, "pages"), columns=["url"]).to_pandas()
            counts[(mode, wk)] = df
            assert df.url.value_counts().max() == 1, (mode, wk)  # one row per url
        assert len(counts[("wide", "auto")]) == len(counts[("narrow", "broadcast")])
        assert len(counts[("wide", "auto")]) == len(counts[("narrow", "partitioned")])
        assert set(counts[("wide", "auto")].url) == set(counts[("narrow", "broadcast")].url)
        assert set(counts[("wide", "auto")].url) == set(counts[("narrow", "partitioned")].url)


class TestPyramid:
    def test_cascade_matches_direct_groupby_and_resume_skips(
        self, ray_session, tmp_path_factory
    ):
        import pyarrow as pa
        import ray.data

        from edkray.geo.cells import quadcell, quadcell_parent
        from edkray.ops.aggregate import grouped_agg
        from edkray.pipelines.pyramid import build_overviews, pyramid_union

        rng = np.random.default_rng(5)
        lon = rng.uniform(-180, 180, 4000)
        lat = rng.uniform(-85, 85, 4000)
        base_cells = quadcell(lon, lat, 8)
        ds = ray.data.from_arrow(pa.table({"cell": pa.array(base_cells)})).repartition(6)
        base = grouped_agg(ds, ["cell"], [("count", None, "n")])
        out = str(tmp_path_factory.mktemp("pyr"))
        levels = build_overviews(
            base, "cell", base_res=8, min_res=5, aggs=[("sum", "n", "n")], out_dir=out
        )
        # every level equals the direct group-by from the raw points
        for r in (7, 6, 5):
            got = levels[r].to_pandas().sort_values("cell").reset_index(drop=True)
            exp = (
                pd.DataFrame({"cell": quadcell_parent(base_cells, r), "n": 1})
                .groupby("cell", as_index=False)["n"].sum()
                .sort_values("cell").reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got.astype({"n": "int64"}), exp.astype({"n": "int64"}))
        # union carries all levels; per-level totals all equal the base count
        uni = pyramid_union(levels).to_pandas()
        assert len(uni) == sum(len(levels[r].to_pandas()) for r in (7, 6, 5))
        # resume: poison one checkpoint level's parquet; resumed build must
        # re-read (skip) it rather than recompute
        levels2 = build_overviews(
            base, "cell", base_res=8, min_res=5, aggs=[("sum", "n", "n")],
            out_dir=out, resume=True,
        )
        for r in (7, 6, 5):
            assert levels2[r].to_pandas()["n"].sum() == 4000
        # re-run WITHOUT resume into the same out_dir: write_parquet
        # appends on Ray 2.49, so stale files must be purged first or
        # every level double-counts (ADVICE r2 high)
        levels3 = build_overviews(
            base, "cell", base_res=8, min_res=5, aggs=[("sum", "n", "n")], out_dir=out
        )
        for r in (7, 6, 5):
            assert levels3[r].to_pandas()["n"].sum() == 4000

    def test_count_job_falls_back_to_distributed_agg(
        self, ray_session, fixture_dir, tmp_path_factory, monkeypatch
    ):
        """Round-3 regression: at 38M docs the count job's driver-side
        partial bound tripped and crashed the run. The flagship must
        fall back to the distributed grouped_agg and produce identical
        output."""
        import edkray.ops.aggregate as agg
        from edkray.pipelines.spatial import run_spatial_pipeline

        real = agg.grouped_agg_small

        def _tiny_bound(ds, keys, aggs, **kw):
            kw["max_partial_rows"] = 1  # force the ValueError path
            return real(ds, keys, aggs, **kw)

        monkeypatch.setattr(agg, "grouped_agg_small", _tiny_bound)
        pages = os.path.join(fixture_dir, "pages.parquet")
        out = str(tmp_path_factory.mktemp("fallback"))
        m = run_spatial_pipeline(pages, admin=make_admin(), out_dir=out,
                                 num_partitions=4, resume=False)
        ref_out = str(tmp_path_factory.mktemp("ref"))
        monkeypatch.setattr(agg, "grouped_agg_small", real)
        m2 = run_spatial_pipeline(pages, admin=make_admin(), out_dir=ref_out,
                                  num_partitions=4, resume=False)
        a = pq.read_table(os.path.join(out, "assignments")).to_pandas().sort_values("url")
        b = pq.read_table(os.path.join(ref_out, "assignments")).to_pandas().sort_values("url")
        assert a["rank"].tolist() == b["rank"].tolist()
        assert a["tile_id"].tolist() == b["tile_id"].tolist()

    def test_crashed_level_purged_on_rerun(self, ray_session, tmp_path_factory):
        """A partial level dir (no _DONE — simulated crash mid-write) must
        be cleared before recompute, not appended to (ADVICE r2 high)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data

        from edkray.geo.cells import quadcell
        from edkray.ops.aggregate import grouped_agg
        from edkray.pipelines.pyramid import build_overviews

        rng = np.random.default_rng(6)
        cells = quadcell(rng.uniform(-180, 180, 1000), rng.uniform(-85, 85, 1000), 8)
        ds = ray.data.from_arrow(pa.table({"cell": pa.array(cells)})).repartition(4)
        base = grouped_agg(ds, ["cell"], [("count", None, "n")])
        out = str(tmp_path_factory.mktemp("pyrcrash"))
        # fake a crashed run: partial parquet in res=7/ without _DONE
        part = os.path.join(out, "res=7")
        os.makedirs(part)
        pq.write_table(pa.table({"cell": pa.array([0], type=pa.int64()),
                                 "n": pa.array([999], type=pa.int64())}),
                       os.path.join(part, "stale.parquet"))
        levels = build_overviews(
            base, "cell", base_res=8, min_res=6, aggs=[("sum", "n", "n")],
            out_dir=out, resume=True,
        )
        assert levels[7].to_pandas()["n"].sum() == 1000
        assert levels[6].to_pandas()["n"].sum() == 1000
