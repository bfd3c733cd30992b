"""Native C++ runtime: build, safetensors mapping parity, bf16 conversion,
WAV writer parity with the Python implementation."""

import json
import os
import struct

import numpy as np
import pytest

from qwen_tts_tpu.io import native
from qwen_tts_tpu.io.safetensors import SafeTensorsFile
from qwen_tts_tpu.io.wav import read_wav

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native runtime unavailable (no g++?)"
)


@pytest.fixture(scope="module")
def st_file(tmp_path_factory):
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("native")
    path = str(d / "t.safetensors")
    rng = np.random.default_rng(0)
    tensors = {
        "a": rng.standard_normal((32, 16)).astype(np.float32),
        "b": rng.integers(0, 100, (8,)).astype(np.int32),
    }
    save_file(tensors, path)
    return path, tensors


def test_native_map_matches_python_reader(st_file):
    path, tensors = st_file
    m = native.NativeMap(path, prefetch_threads=2)
    header = json.loads(m.header_bytes())
    assert set(header.keys()) >= {"a", "b"}

    py = SafeTensorsFile(path)
    for name, want in tensors.items():
        begin, end = header[name]["data_offsets"]
        got = m.view(begin, end).view(want.dtype).reshape(want.shape)
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(np.asarray(py.get(name)), want)
    py.close()
    m.close()


def test_bf16_roundtrip():
    import ml_dtypes

    x = np.random.default_rng(1).standard_normal(100000).astype(np.float32)
    bf = x.astype(ml_dtypes.bfloat16)
    got = native.bf16_to_f32(bf.view(np.uint16), n_threads=4)
    np.testing.assert_array_equal(got, bf.astype(np.float32))


def test_native_wav_matches_python(tmp_path):
    from qwen_tts_tpu.io.wav import write_wav as py_write

    x = np.sin(np.linspace(0, 100, 24000)).astype(np.float32) * 0.5
    p_native = str(tmp_path / "n.wav")
    p_python = str(tmp_path / "p.wav")
    native.write_wav(p_native, x, 24000)
    py_write(p_python, x, 24000)
    a, ra = read_wav(p_native)
    b, rb = read_wav(p_python)
    assert ra == rb == 24000
    np.testing.assert_allclose(a, b, atol=1.0 / 32768)
