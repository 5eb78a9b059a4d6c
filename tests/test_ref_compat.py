"""Reference executable-spec parity: Property 1 round trips with the
reference's exact (non-multiplicative) NTT semantics, over the spec's own
prime table (ntt-round-trip.prop.test.ts:30-43, valid rows)."""
import numpy as np
import pytest

from node_fhe_accelerate_tpu.ops.ref_compat import (
    ref_forward_ntt, ref_inverse_ntt, ref_round_trip_ok,
)
from node_fhe_accelerate_tpu.ops.ntt import NTTContext, negacyclic_mul_np
from node_fhe_accelerate_tpu.ops.u64 import u64_from_np, u64_to_np

# the spec's table rows whose moduli are actually prime
SPEC_PRIMES = {8: 17, 16: 97, 32: 193, 64: 257, 128: 769, 256: 7681,
               512: 12289, 1024: (1 << 27) - (1 << 11) + 1}


@pytest.mark.parametrize("n", [8, 32, 128, 512])
def test_spec_property1_round_trip(n):
    q = SPEC_PRIMES[n]
    rng = np.random.default_rng(n)
    coeffs = [int(x) for x in rng.integers(0, q, n, dtype=np.uint64)]
    assert ref_round_trip_ok(coeffs, q)


def test_ref_transform_is_not_multiplicative():
    """Documents the reference defect: its pointwise product is NOT the
    negacyclic product (ours is)."""
    n, q = 16, 97
    rng = np.random.default_rng(3)
    a = [int(x) for x in rng.integers(0, q, n, dtype=np.uint64)]
    b = [int(x) for x in rng.integers(0, q, n, dtype=np.uint64)]
    fa = ref_forward_ntt(a, q)
    fb = ref_forward_ntt(b, q)
    ref_prod = ref_inverse_ntt([x * y % q for x, y in zip(fa, fb)], q)
    true_prod = [int(x) for x in negacyclic_mul_np(a, b, q)]
    assert ref_prod != true_prod       # the reference's multiply is wrong
    # and our NTT gets it right
    ntt = NTTContext(n, q)
    ours = u64_to_np(ntt.negacyclic_mul(
        u64_from_np(np.array(a, dtype=np.uint64)),
        u64_from_np(np.array(b, dtype=np.uint64))))
    assert [int(x) for x in ours] == true_prod
