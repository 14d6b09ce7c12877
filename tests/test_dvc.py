"""DVC pointer generation (reference data.dvc / data_split.dvc format)."""

import hashlib
import json

from livecell_tpu.data.dvc import (
    dir_hash, dir_manifest, file_md5, make_pointer, write_dvc_config)


def test_pointer_format_and_hashes(tmp_path):
    d = tmp_path / "data_split"
    (d / "sub").mkdir(parents=True)
    (d / "a.txt").write_bytes(b"hello")
    (d / "sub" / "b.bin").write_bytes(b"\x00" * 100)

    manifest = dir_manifest(d)
    assert [e["relpath"] for e in manifest] == ["a.txt", "sub/b.bin"]
    assert manifest[0]["md5"] == hashlib.md5(b"hello").hexdigest()

    ptr = make_pointer(d)
    lines = ptr.splitlines()
    assert lines[0] == "outs:"
    assert lines[1].startswith("- md5: ") and lines[1].endswith(".dir")
    assert lines[2] == "  size: 105"
    assert lines[3] == "  nfiles: 2"
    assert lines[4] == "  hash: md5"
    assert lines[5] == "  path: data_split"

    # Directory hash is the md5 of the canonical JSON manifest.
    payload = json.dumps(manifest, sort_keys=True,
                         separators=(",", ": ")).encode()
    assert dir_hash(manifest) == hashlib.md5(payload).hexdigest() + ".dir"

    # Stable under regeneration; changes when content changes.
    assert make_pointer(d) == ptr
    (d / "a.txt").write_bytes(b"hello2")
    assert make_pointer(d) != ptr


def test_single_file_pointer_and_config(tmp_path):
    f = tmp_path / "model.pth"
    f.write_bytes(b"x" * 10)
    ptr = make_pointer(f)
    assert f"- md5: {file_md5(f)}" in ptr and "nfiles" not in ptr

    cfg = write_dvc_config(tmp_path, "gdrive://folder123")
    text = cfg.read_text()
    assert "remote = storage" in text
    assert "url = gdrive://folder123" in text
