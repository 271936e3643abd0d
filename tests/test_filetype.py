"""M8 file-type taxonomy: every detect_type_by_data branch pinned.

Oracle strategy: hand-built minimal payloads per format (genuine gzip /
bz2 / zip / xz / tar bytes from the stdlib where available, crafted
headers otherwise) with the expected type from the reference's semantics
(archive/pc_archive.c:1918-2070, utils/phash/extensions.h)."""

import numpy as np
import pyarrow as pa

from pcompress_ray.stages import filetype as ft


def test_data_magic_branches():
    cases = [
        (b"XPCOM\nMozFASL\r\n\x1a" + b"x" * 8, ft.TYPE_BINARY),
        (b"RIFF\x24\x00\x00\x00WAVEfmt ", ft.TYPE_BINARY | ft.TYPE_WAV),
        (b"!<arch>\n" + b"x" * 8, ft.TYPE_BINARY | ft.TYPE_ARCHIVE_AR),
        (b"%PDF-1.4\n" + b"x" * 8, ft.TYPE_BINARY | ft.TYPE_PDF),
        (b"\0" * 60 + b"DICM" + b"\0" * 80, ft.TYPE_BINARY | ft.TYPE_DICOM),
        (b"\0" * 60 + b"ISO_IR " + b"\0" * 80, ft.TYPE_BINARY | ft.TYPE_DICOM),
        (b"\xff\xd8\xff\xe0\x00\x10JFIF\x00", ft.TYPE_BINARY | ft.TYPE_JPEG),
        (b"\xff\xd8\xff\xe1\x00\x10Exif\x00", ft.TYPE_BINARY | ft.TYPE_JPEG),
        # ELF: class byte 1/2 = 32/64-bit; e_type byte 16 == 4 → core dump
        (b"\x7fELF\x01" + b"\0" * 11 + b"\x02\0\0\0",
         ft.TYPE_BINARY | ft.TYPE_EXE32),
        (b"\x7fELF\x02" + b"\0" * 11 + b"\x02\0\0\0",
         ft.TYPE_BINARY | ft.TYPE_EXE64),
        (b"\x7fELF\x01" + b"\0" * 11 + b"\x04\0\0\0", ft.TYPE_BINARY),
        (b"LZ" + b"\0" * 10, ft.TYPE_BINARY | ft.TYPE_EXE32),
        (b"BM" + b"\0" * 12 + b"\x28\x00" + b"\0" * 8,
         ft.TYPE_BINARY | ft.TYPE_BMP),
        (b"TZif2" + b"\0" * 10, ft.TYPE_BINARY),
        (b"PPMZ" + b"\0" * 10,
         ft.TYPE_BINARY | ft.TYPE_COMPRESSED | ft.TYPE_COMPRESSED_PPMD),
        (b"wvpk" + b"\0" * 10,
         ft.TYPE_BINARY | ft.TYPE_COMPRESSED | ft.TYPE_AUDIO_COMPRESSED),
        (b"TTA1" + b"\0" * 10,
         ft.TYPE_BINARY | ft.TYPE_COMPRESSED | ft.TYPE_AUDIO_COMPRESSED),
        (b"P6\n4 4\n255\n" + b"\0" * 10, ft.TYPE_BINARY | ft.TYPE_PNM),
        (b"S5 raster" + b"\0" * 10, ft.TYPE_BINARY | ft.TYPE_PNM),
        # MSDOS COM: jmp opcode + 0xaa55 boot signature at 0x1fe
        (b"\xe9" + b"\0" * 0x1fd + b"\x55\xaa",
         ft.TYPE_BINARY | ft.TYPE_EXE32),
        (b"\xeb" + b"\0" * 10, ft.TYPE_BINARY),
        (bytes([0x42, 0x01]) + b"\0" * 10, ft.TYPE_BINARY | ft.TYPE_EXE32),
        (bytes([0x64, 0x86]) + b"\0" * 10, ft.TYPE_BINARY | ft.TYPE_EXE64),
        (b"\x55\xaa" + b"\0" * 10, ft.TYPE_BINARY | ft.TYPE_EXE32),
        (b"\0\0\x21\xcd" + b"\0" * 8, ft.TYPE_BINARY | ft.TYPE_EXE32),
        (b"random text here", ft.TYPE_UNKNOWN),
        (b"short", ft.TYPE_UNKNOWN),
    ]
    for buf, want in cases:
        assert ft.detect_type_by_data(buf) == want, (buf[:12], want)


def test_pe_exe_and_tar():
    import io
    import tarfile

    assert ft.detect_type_by_data(ft._pe32_exe()) == \
        ft.TYPE_BINARY | ft.TYPE_EXE32_PE
    assert ft.detect_type_by_data(ft._pe64_exe()) == \
        ft.TYPE_BINARY | ft.TYPE_EXE64
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as tf:
        ti = tarfile.TarInfo("x")
        ti.size = 0
        tf.addfile(ti)
    assert ft.detect_type_by_data(tbuf.getvalue()) == \
        ft.TYPE_BINARY | ft.TYPE_ARCHIVE_TAR


def test_extended_magics_and_ext_table():
    import bz2
    import gzip
    import lzma

    assert ft.detect_type_extended(gzip.compress(b"x" * 64)) == \
        ft.TYPE_BINARY | ft.TYPE_COMPRESSED | ft.TYPE_COMPRESSED_GZ
    assert ft.detect_type_extended(bz2.compress(b"x" * 64)) == \
        ft.TYPE_BINARY | ft.TYPE_COMPRESSED | ft.TYPE_COMPRESSED_BZ2
    assert ft.detect_type_extended(lzma.compress(b"x" * 64)) == \
        ft.TYPE_BINARY | ft.TYPE_COMPRESSED | ft.TYPE_COMPRESSED_LZMA
    assert ft.detect_type_extended(b"GIF89a" + b"\0" * 10) == \
        ft.TYPE_BINARY | ft.TYPE_COMPRESSED | ft.TYPE_COMPRESSED_LZW
    assert ft.detect_type_extended(b"fLaC" + b"\0" * 10) == \
        ft.TYPE_BINARY | ft.TYPE_FLAC
    assert ft.detect_type_extended(b"RIFF\0\0\0\0AVI " + b"\0" * 8) == \
        ft.TYPE_BINARY | ft.TYPE_AVI
    assert ft.detect_type_extended(b"\0\0\0\x18ftypisom" + b"\0" * 8) == \
        ft.TYPE_BINARY | ft.TYPE_COMPRESSED | ft.TYPE_MP4
    # data detection takes precedence over extended magics
    assert ft.detect_type_extended(b"%PDF-1.4\n" + b"\0" * 8) == \
        ft.TYPE_BINARY | ft.TYPE_PDF

    assert len(ft.EXT_TYPES) >= 200
    assert ft.detect_type_by_ext("a/b/page.HTML") == \
        ft.TYPE_TEXT | ft.TYPE_MARKUP
    assert ft.detect_type_by_ext("x.tgz") == \
        ft.TYPE_BINARY | ft.TYPE_COMPRESSED | ft.TYPE_COMPRESSED_GZ
    assert ft.detect_type_by_ext("genome.fna") == \
        ft.TYPE_TEXT | ft.TYPE_DNA_SEQ
    assert ft.detect_type_by_ext("noext") == ft.TYPE_UNKNOWN
    assert ft.detect_type_by_ext("trailing.") == ft.TYPE_UNKNOWN


def test_fake_corpus_classifies_exactly():
    t = ft.make_fake_file_table(repeats=3)
    out = ft.detect_types_batch(t, path_col="path")
    exp = out["expected"].to_pylist()
    got = out["ftype_name"].to_pylist()
    assert exp == got
    # taxonomy breadth: ≥ 25 distinct subtype tags exercised
    assert len(set(exp)) >= 25


def test_file_type_stats_query(ray_session):
    import pcompress_ray

    pcompress_ray.register_for_ray()
    import __ray_entry__ as e

    out = e.queries()["file_type_stats"]("/root/testdata/sf0.001").to_pandas()
    t = ft.make_fake_file_table(repeats=8)
    want = ft.detect_types_batch(t, path_col="path").to_pandas() \
        .groupby("ftype_name").size()
    got = dict(zip(out["ftype_name"], out["n_files"]))
    assert got == want.to_dict()


def test_detect_types_batch_bounded_prefix_on_large_payloads():
    """Sniffing reads a bounded 4 KiB prefix: a multi-MB payload classifies
    identically to its prefix (gzip magic at 0, tar magic at offset 257,
    boot signature at 0x1fe all land inside the window)."""
    import gzip
    import io
    import tarfile

    gz = gzip.compress(b"hello world") + b"\0" * (3 << 20)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo("a.txt")
        info.size = 3
        tf.addfile(info, io.BytesIO(b"abc"))
    tar = buf.getvalue() + b"\0" * (3 << 20)
    boot = b"\xe9" + b"\0" * 0x1fd + b"\x55\xaa" + b"\xcc" * (1 << 20)
    t = pa.table({"file_id": pa.array([0, 1, 2], pa.int64()),
                  "payload": pa.array([gz, tar, boot], pa.binary())})
    out = ft.detect_types_batch(t)
    types = out["ftype"].to_pylist()
    assert types[0] == ft.TYPE_BINARY | ft.TYPE_COMPRESSED \
        | ft.TYPE_COMPRESSED_GZ
    assert types[1] == ft.TYPE_BINARY | ft.TYPE_ARCHIVE_TAR
    assert types[2] == ft.TYPE_BINARY | ft.TYPE_EXE32


def test_pe_with_oversized_dos_stub_degrades_to_exe32():
    """An MZ executable whose e_lfanew points past the 64 KiB sniffing
    window (huge DOS stub) classifies as plain EXE32 — not UNKNOWN — while
    a malformed e_lfanew past EOF still falls through like the reference."""
    stub = bytearray(b"\0" * 0x20000)
    stub[0:2] = b"MZ"
    stub[0x18:0x1A] = (0x40).to_bytes(2, "little")  # reloc table >= 0x40
    stub[0x3C:0x40] = (0x1F000).to_bytes(4, "little")  # e_lfanew past 64K
    stub[0x1F000:0x1F004] = b"PE\0\0"
    t = pa.table({"file_id": pa.array([0], pa.int64()),
                  "payload": pa.array([bytes(stub)], pa.binary())})
    out = ft.detect_types_batch(t)
    assert out["ftype"][0].as_py() == ft.TYPE_BINARY | ft.TYPE_EXE32
    # full-buffer semantics unchanged: e_lfanew past EOF -> not an EXE
    bad = bytes(stub[:0x100])  # truncated: off points beyond total_len
    assert ft.detect_type_by_data(bad, total_len=len(bad)) \
        != ft.TYPE_BINARY | ft.TYPE_EXE32
