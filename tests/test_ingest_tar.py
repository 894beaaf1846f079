"""Tar-part page-data readers (reference FilterMain.py:22-54): split
single-stream parts and per-shard complete archives, end-to-end into the
filter/index pipeline's input shape."""

import json
import os
import tarfile

import pytest


def _make_pages(n, prefix="h0"):
    # per-page distinct vocabulary so the 0.975 near-dup filter keeps them
    return [
        {"url": f"https://{prefix}.example.com/p/{i}#frag",
         "content": f"<html><title>T{i}</title><body>page {i} body "
                    + " ".join(f"w{i}x{j}" for j in range(30))
                    + "</body></html>",
         "encoding": "utf-8"}
        for i in range(n)
    ]


def _write_tar(path, pages, start=0):
    with tarfile.open(path, "w:gz") as tar:
        for i, page in enumerate(pages, start):
            data = json.dumps(page).encode()
            member = tarfile.TarInfo(name=f"data/{i:05d}.json")
            member.size = len(data)
            import io

            tar.addfile(member, io.BytesIO(data))


def _split(path, part_size):
    """`split -b` equivalent: byte-slice one archive into -partaa/-partab…"""
    with open(path, "rb") as f:
        blob = f.read()
    parts = []
    for i in range(0, len(blob), part_size):
        suffix = chr(ord("a") + i // part_size)
        p = f"{path}-parta{suffix}"
        with open(p, "wb") as f:
            f.write(blob[i:i + part_size])
        parts.append(p)
    os.unlink(path)
    return parts


class TestTarParts:
    def test_split_parts_roundtrip(self, ray_session, tmp_path):
        from spidey_ray.pipelines.ingest import read_tar_parts

        pages = _make_pages(23)
        tar_path = str(tmp_path / "data.tar.gz")
        _write_tar(tar_path, pages)
        _split(tar_path, 2048)   # multiple parts
        ds = read_tar_parts(str(tmp_path / "data.tar.gz-parta*"),
                            rows_per_block=8)
        df = ds.to_pandas().sort_values("crawl_seq")
        assert len(df) == 23
        assert list(df["crawl_seq"]) == list(range(23))
        assert df["url"].iloc[5] == pages[5]["url"]
        assert "page 5 body" in df["content"].iloc[5]

    def test_empty_glob_returns_empty_dataset(self, ray_session, tmp_path):
        """No matching parts → empty typed dataset, not tarfile.ReadError
        on a zero-byte stream."""
        from spidey_ray.pipelines.ingest import read_tar_parts

        ds = read_tar_parts(str(tmp_path / "nothing-here-part*"))
        assert ds.count() == 0
        assert sorted(ds.schema().names) == [
            "content", "crawl_seq", "encoding", "url"]

    def test_parts_into_filter_index(self, ray_session, tmp_path):
        """parts → pages → documents → run_filter_index: the full switchover
        path for a user with the reference's data.tar.gz-part* archives."""
        from spidey_ray.pipelines.ingest import (
            documents_from_pages, read_tar_parts)
        from spidey_ray.pipelines.filter_index import run_filter_index

        pages = _make_pages(12)
        pages.append(dict(pages[3]))   # exact duplicate → deduped downstream
        tar_path = str(tmp_path / "data.tar.gz")
        _write_tar(tar_path, pages)
        _split(tar_path, 4096)
        docs = documents_from_pages(
            read_tar_parts(str(tmp_path / "data.tar.gz-parta*")))
        fi = run_filter_index(docs, str(tmp_path / "out"))
        assert fi.num_documents == 12   # duplicate of p/3 dropped, first wins

    def test_shards_parallel_reader(self, ray_session, tmp_path):
        from spidey_ray.pipelines.ingest import read_tar_shards

        _write_tar(str(tmp_path / "shard-000.tar.gz"), _make_pages(5, "h0"))
        _write_tar(str(tmp_path / "shard-001.tar.gz"), _make_pages(7, "h1"))
        df = read_tar_shards(str(tmp_path / "shard-*.tar.gz")).to_pandas()
        assert len(df) == 12
        # crawl_seq respects shard order then member order
        h0 = df[df["url"].str.contains("h0")]["crawl_seq"]
        h1 = df[df["url"].str.contains("h1")]["crawl_seq"]
        assert h0.max() < h1.min()


class TestJsonlPages:
    def test_jsonl_to_documents_end_to_end(self, ray_session, tmp_path):
        import json

        from spidey_ray.pipelines.ingest import (documents_from_pages,
                                                 read_jsonl_pages)

        rows = [
            {"url": f"https://h0.example.com/p/{i}#frag",
             "content": f"<html><head><title>T{i}</title></head>"
                        f"<body><p>body {i} words here</p></body></html>",
             "encoding": "utf-8"}
            for i in range(7)
        ]
        (tmp_path / "a.jsonl").write_text(
            "\n".join(json.dumps(r) for r in rows[:4]) + "\n\n")
        (tmp_path / "b.jsonl").write_text(
            "\n".join(json.dumps(r) for r in rows[4:]))
        ds = read_jsonl_pages(str(tmp_path / "*.jsonl"))
        pages = ds.to_pandas().sort_values("crawl_seq")
        assert len(pages) == 7
        # file order then line order; second file's seqs carry the 2^32 tag
        assert pages["crawl_seq"].iloc[4] == (1 << 32)
        docs = documents_from_pages(ds).to_pandas()
        assert len(docs) == 7
        assert set(docs["title"]) == {f"T{i}" for i in range(7)}
        # urldefrag applied (Filter.py:49)
        assert all("#" not in d for d in docs["doc_id"])

    def test_empty_glob(self, ray_session, tmp_path):
        from spidey_ray.pipelines.ingest import read_jsonl_pages

        ds = read_jsonl_pages(str(tmp_path / "none-*.jsonl"))
        assert ds.count() == 0
