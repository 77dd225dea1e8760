"""Corpus generator + Lance-layout adapter tests (Ray build path included)."""

import numpy as np
import pyarrow as pa
import pytest

from ieps_crawler_ray.functions.codecs import decode_image, psnr
from ieps_crawler_ray.functions.hashing import phash64
from ieps_crawler_ray.sources import corpus as C
from ieps_crawler_ray.sources import lance_table as lt

SPEC = C.CorpusSpec(n_images=300, n_hosts=6, num_buckets=4)


class TestCorpusPure:
    def test_host_ranges_cover_and_skew(self):
        b = C.host_boundaries(SPEC)
        sizes = np.diff(b)
        assert sizes.sum() == SPEC.n_images
        assert (sizes > 0).all()
        assert sizes[0] > sizes[-1]  # Zipf skew: host0 is hot

    def test_url_roundtrip(self):
        urls = C.url_of_index(SPEC, [0, 150, 299])
        assert [C.index_of_url(u) for u in urls] == [0, 150, 299]
        assert C.index_of_url("http://elsewhere.example/x") == -1

    def test_rows_deterministic_and_schema(self):
        t1 = C.rows_for_indices(SPEC, [3, 7])
        t2 = C.rows_for_indices(SPEC, [3, 7])
        assert t1.equals(t2)
        assert t1.schema.equals(C.IMAGE_SCHEMA)

    def test_phash_matches_decoded_bytes(self):
        t = C.rows_for_indices(SPEC, [11, 12])
        for row in range(2):
            px = decode_image(t["bytes"][row].as_py(), t["fmt"][row].as_py())
            assert phash64(px) == t["phash"][row].as_py()

    def test_lossy_rows_meet_psnr_gate(self):
        fmts = C.fmt_of_index(SPEC, np.arange(100))
        jpeg_idx = np.where(fmts == "jpeg")[0][:3]
        t = C.rows_for_indices(SPEC, jpeg_idx)
        for row in range(t.num_rows):
            i = int(jpeg_idx[row])
            original = C.pixels_of_index(SPEC, i)
            decoded = decode_image(t["bytes"][row].as_py(), "jpeg")
            assert psnr(original, decoded) >= 40.0

    def test_out_links_in_range_and_mostly_same_host(self):
        same = total = 0
        for i in [0, 10, 200]:
            targets, anchors = C.out_links_of_index(SPEC, i)
            assert len(targets) == len(anchors)
            assert 3 <= len(targets) <= 12
            assert all(0 <= t < SPEC.n_images for t in targets)
            assert all(t != i for t in targets)
            h = C.host_of_index(SPEC, [i])[0]
            th = C.host_of_index(SPEC, targets)
            same += int((th == h).sum())
            total += len(targets)
        assert same / total > 0.5

    def test_robots_deterministic(self):
        a = C.robots_for_host(SPEC, 3)
        b = C.robots_for_host(SPEC, 3)
        assert a == b
        assert 1 <= a.crawl_delay_slots <= 4


class TestLanceAdapter:
    def test_write_read_pyarrow(self, tmp_path):
        t = pa.table({"x": [1, 2, 3], "part": [0, 0, 1]})
        man = lt.write_table(t, str(tmp_path / "tbl"), partition_col="part")
        assert man["version"] == 1
        assert man["num_rows"] == 3
        back = lt.read_pyarrow(str(tmp_path / "tbl"))
        assert back.num_rows == 3
        only0 = lt.read_pyarrow(str(tmp_path / "tbl"), partitions=[0])
        assert only0.num_rows == 2

    def test_versioned_rewrite(self, tmp_path):
        p = str(tmp_path / "tbl")
        lt.write_table(pa.table({"x": [1]}), p)
        man2 = lt.write_table(pa.table({"x": [1, 2]}), p)
        assert man2["version"] == 2

    def test_uncommitted_fragments_invisible(self, tmp_path):
        p = str(tmp_path / "tbl")
        lt.write_table(pa.table({"x": [1, 2]}), p)
        # simulate a crashed concurrent write: stray parquet not in manifest
        import pyarrow.parquet as pq

        pq.write_table(pa.table({"x": [99]}), str(tmp_path / "tbl" / "frag-stray.parquet"))
        assert lt.read_pyarrow(p).num_rows == 2


@pytest.mark.usefixtures("ray_session")
class TestCorpusRayBuild:
    def test_build_and_read(self, tmp_path):
        path = C.build_corpus(SPEC, str(tmp_path / "corpus"))
        man = lt.read_manifest(path)
        assert man["num_rows"] == SPEC.n_images
        parts = {f["partition"] for f in man["fragments"]}
        assert parts <= set(range(SPEC.num_buckets))
        ds = lt.read_dataset(path, columns=["image_id", "caption", "phash"])
        assert ds.count() == SPEC.n_images
        # Ray-built rows equal the pure-function rows (same bytes)
        tbl = lt.read_pyarrow(path)
        tbl = tbl.sort_by("image_id")
        pure = C.rows_for_indices(SPEC, np.arange(SPEC.n_images))
        for col in ["image_id", "bytes", "caption", "phash", "fmt"]:
            assert tbl[col].to_pylist() == pure[col].to_pylist(), col
