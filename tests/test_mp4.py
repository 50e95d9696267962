"""MP4 container parser tests (`sources/mp4.py`): real ISO BMFF box
structure (built by the fixture builder, spec-conformant ftyp/mdat/moov
with full sample tables), exact byte-range recovery, keyframe/time
indexing, and the distributed frame-sampling path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pm25ml_spark.sources.mp4 import (
    Mp4Sample,
    build_mp4,
    extract_frames,
    parse_mp4,
)


def _frames(n=12):
    return [bytes([i]) * (40 + 9 * i) for i in range(n)]


class TestParser:
    def test_track_metadata(self):
        mp4 = build_mp4(_frames(), fps=10, width=64, height=48)
        (track,) = parse_mp4(mp4)
        assert track.handler == "vide"
        assert track.codec == "mp4v"
        assert (track.width, track.height) == (64, 48)
        assert len(track.samples) == 12

    def test_exact_byte_ranges(self):
        frames = _frames()
        mp4 = build_mp4(frames)
        (track,) = parse_mp4(mp4)
        for s in track.samples:
            assert mp4[s.offset : s.offset + s.size] == frames[s.index]

    def test_timestamps_and_keyframes(self):
        mp4 = build_mp4(_frames(), fps=10, keyframe_every=5)
        (track,) = parse_mp4(mp4)
        np.testing.assert_allclose(
            [s.time_s for s in track.samples], np.arange(12) / 10.0
        )
        assert [s.index for s in track.samples if s.keyframe] == [0, 5, 10]

    def test_not_mp4_rejected(self):
        with pytest.raises(ValueError, match="missing leading ftyp"):
            parse_mp4(b"\x89PNG\r\n\x1a\n" + bytes(32))

    def test_inconsistent_tables_rejected(self):
        mp4 = bytearray(build_mp4(_frames(4)))
        # corrupt stco's chunk count to zero: samples can't be placed
        i = mp4.index(b"stco")
        mp4[i + 8 : i + 12] = struct.pack(">I", 0)
        with pytest.raises(ValueError, match="sample tables inconsistent"):
            parse_mp4(bytes(mp4))


class TestExtract:
    def test_keyframes_only(self):
        frames = _frames()
        out = extract_frames(build_mp4(frames, keyframe_every=5), keyframes_only=True)
        assert [i for i, _, _ in out] == [0, 5, 10]
        assert [f for _, _, f in out] == [frames[0], frames[5], frames[10]]

    def test_every_n_and_spread(self):
        mp4 = build_mp4(_frames())
        assert [i for i, _, _ in extract_frames(mp4, every_n=4)] == [0, 4, 8]
        spread = extract_frames(mp4, n_frames=3)
        assert len(spread) == 3

    def test_no_video_track_raises(self):
        # build then relabel the handler as audio
        mp4 = bytearray(build_mp4(_frames(2)))
        i = mp4.index(b"hdlr")
        mp4[i + 12 : i + 16] = b"soun"
        with pytest.raises(ValueError, match="no video track"):
            extract_frames(bytes(mp4), every_n=1)


class TestSparkSampling:
    def test_mp4_payloads_through_sample_frames(self, spark):
        """Distributed frame sampling over real MP4 bytes: each output
        row carries the frame's actual compressed bytes + timestamp."""
        from pm25ml_spark.sources.multimodal import MEDIA_SCHEMA, sample_frames

        rows = []
        originals = {}
        for mid in range(3):
            frames = [bytes([mid * 16 + i]) * 30 for i in range(10)]
            originals[mid] = frames
            payload = build_mp4(frames, fps=5, width=32, height=24)
            rows.append(
                (mid, "video", "mp4", 32, 24, len(payload), bytearray(payload))
            )
        media = spark.createDataFrame(rows, MEDIA_SCHEMA)
        out = sample_frames(media, every_n=3).toPandas()
        assert sorted(out["frame_idx"].unique()) == [0, 3, 6, 9]
        for row in out.itertuples(index=False):
            assert bytes(row.frame) == originals[row.media_id][row.frame_idx]
            assert row.time_s == pytest.approx(row.frame_idx / 5.0)
            assert (row.width, row.height) == (32, 24)

    def test_raw_fallback_still_works(self, spark):
        from pm25ml_spark.sources.multimodal import (
            sample_frames,
            synthesize_media_table,
        )

        media = synthesize_media_table(spark, n=9)
        out = sample_frames(media, n_frames=3).toPandas()
        assert set(out.columns) == {
            "media_id", "frame_idx", "time_s", "width", "height", "frame"
        }
        assert len(out) > 0


def test_truncated_mdat_rejected_not_silently_short():
    """A sample byte range past EOF must raise, not emit short/empty
    frame bytes into the pipeline."""
    frames = _frames(6)
    mp4 = build_mp4(frames)
    # cut the file inside mdat but keep enough for ftyp+mdat header; the
    # moov at the tail is gone -> parse fails loudly
    with pytest.raises(ValueError):
        extract_frames(mp4[: len(mp4) - len(frames[-1]) - 4], every_n=1)
    # moov intact but mdat payload shortened: rebuild with lying stsz
    mp4b = bytearray(mp4)
    i = mp4b.index(b"stsz")
    # inflate the last sample's declared size past EOF
    mp4b[i + 16 + 4 * 5 : i + 20 + 4 * 5] = struct.pack(">I", 1 << 20)
    with pytest.raises(ValueError, match="past EOF"):
        extract_frames(bytes(mp4b), every_n=1)
