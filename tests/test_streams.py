"""Stream pipeline classes (core/streams.py) — the Python/TPU analog of the
reference's Node stream classes (src/streaming/node-streams.ts:27-352):
source -> transform -> addition -> sink composition, micro-batched dispatch,
progress, and equivalence with the non-streamed ops."""
import numpy as np
import pytest
import jax

from node_fhe_accelerate_tpu.core.params import ParameterSet, FHEScheme
from node_fhe_accelerate_tpu.core.keys import KeyManager
from node_fhe_accelerate_tpu.core.encrypt import EncryptionEngine, Plaintext
from node_fhe_accelerate_tpu.api.engine import FHEEngine
from node_fhe_accelerate_tpu.core.streams import (
    CiphertextReadable, CiphertextWritable, TransformStream, AdditionStream,
    EncryptionStream, DecryptionStream, pipeline,
)


def small_params(t=16):
    return ParameterSet(
        scheme=FHEScheme.TFHE, poly_degree=256, moduli=[1073479681],
        lwe_dimension=64, lwe_noise_std=3.2e-11, glwe_dimension=1,
        decomp_base_log=8, decomp_level=4, plaintext_modulus=t,
    )


@pytest.fixture(scope="module")
def fhe():
    eng = FHEEngine(small_params())
    sk = eng.generate_secret_key()
    pk = eng.generate_public_key(sk)
    return eng, sk, pk


def test_readable_writable_roundtrip():
    src = CiphertextReadable([1, 2, 3])
    sink = CiphertextWritable().consume(src)
    assert sink.results == [1, 2, 3] and sink.count == 3


def test_transform_micro_batches_and_progress():
    sizes, marks = [], []
    stage = TransformStream(
        lambda xs: (sizes.append(len(xs)) or [x * 10 for x in xs]),
        batch_size=4, progress=marks.append)
    out = list(stage(range(10)))
    assert out == [x * 10 for x in range(10)]
    assert sizes == [4, 4, 2]            # one fn call per micro-batch
    assert marks == [4, 8, 10]


def test_addition_stream_plain_semantics():
    stage = AdditionStream(sum, batch_size=3)
    partials = list(stage(range(1, 8)))  # 1..7
    assert partials == [6, 6 + 4 + 5 + 6, 28]
    final_only = list(AdditionStream(sum, batch_size=3,
                                     emit_partials=False)(range(1, 8)))
    assert final_only == [28]


def test_encrypted_pipeline_matches_batch_ops(fhe):
    """values -> EncryptionStream -> AdditionStream -> decrypt == sum."""
    eng, sk, pk = fhe
    values = [1, 2, 3, 4, 5, 0, 2, 1]
    enc = EncryptionStream(
        lambda vs: eng.batch_encrypt([Plaintext.scalar(v, eng.engine.t)
                                      for v in vs], pk),
        batch_size=3)
    tally = AdditionStream(eng.batch_add, batch_size=4, emit_partials=False)
    (total,) = list(pipeline(values, enc, tally))
    assert eng.decrypt_value(total, sk) == sum(values) % eng.engine.t


def test_decryption_stream(fhe):
    eng, sk, pk = fhe
    values = [3, 1, 4, 1, 5]
    cts = eng.batch_encrypt([Plaintext.scalar(v, eng.engine.t)
                             for v in values], pk)
    dec = DecryptionStream(
        lambda cs: [eng.decrypt_value(c, sk) for c in cs], batch_size=2)
    assert list(pipeline(CiphertextReadable(cts), dec)) == values


def test_pipeline_is_lazy():
    """Stages pull only when the consumer asks (backpressure by iteration)."""
    pulled = []

    def gen():
        for i in range(6):
            pulled.append(i)
            yield i

    it = pipeline(gen(), TransformStream(lambda xs: xs, batch_size=2))
    assert next(it) == 0
    assert pulled == [0, 1]   # exactly one micro-batch pulled so far
