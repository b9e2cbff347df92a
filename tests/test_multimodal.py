"""Real-container multimodal decode (stdlib-only WAV backend):
RIFF/WAVE payloads built and parsed with Python's wave module drive the
SAME audio kernels as raw PCM — proving the decode seam is real (an
actual container format goes in) while staying dependency-free. The
fake/pil image seam has the identical contract (multimodal/__init__.py).
"""

# ------------------------------------------------- real WAV container


def test_wav_container_roundtrips_stdlib():
    from bristle_spark.multimodal import _wav_decode, wav_container

    pcm = bytes(range(256)) * 2
    assert _wav_decode(wav_container(pcm)) == pcm
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _wav_decode(wav_container_8bit())


def wav_container_8bit() -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # 8-bit: kernels must reject
        w.setframerate(8000)
        w.writeframes(b"\x00" * 64)
    return buf.getvalue()


def test_audio_kernels_identical_on_real_wav_payloads(spark, sf_dir):
    """The audio feature and fingerprint kernels produce IDENTICAL
    results whether the payload is raw PCM (fake backend) or the same
    PCM inside a genuine RIFF/WAVE container parsed by the stdlib wave
    module — real-container decode, zero new dependencies."""
    from bristle_spark import multimodal as M

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    raw = M.audio_features(M.attach_fake_audio(d), decode_backend="fake")
    wav = M.audio_features(M.attach_wav_audio(d), decode_backend="wav")
    assert sorted(map(tuple, raw.collect())) == sorted(map(tuple, wav.collect()))
    raw_fp = M.audio_fingerprint(M.attach_fake_audio(d), decode_backend="fake")
    wav_fp = M.audio_fingerprint(M.attach_wav_audio(d), decode_backend="wav")
    assert sorted(map(tuple, raw_fp.collect())) == sorted(map(tuple, wav_fp.collect()))


def test_attach_wav_audio_is_a_real_wave_file(spark, sf_dir):
    """Every payload attach_wav_audio emits parses with Python's wave
    module as 16 kHz mono 16-bit PCM."""
    import io
    import wave

    from bristle_spark import multimodal as M

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    rows = M.attach_wav_audio(d).collect()
    assert rows
    for r in rows:
        with wave.open(io.BytesIO(bytes(r["payload"])), "rb") as w:
            assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (16000, 1, 2)
            assert w.getnframes() == 128
