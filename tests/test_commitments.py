"""KZG and FRI polynomial commitments."""
import numpy as np
import pytest

from node_fhe_accelerate_tpu.zk.commitments import (
    KZGScheme, FRIScheme, FRIConfig, _poly_eval,
)


@pytest.fixture(scope="module")
def kzg():
    scheme = KZGScheme()
    setup = scheme.setup(max_degree=8, seed=3)
    return scheme, setup


class TestKZG:
    @pytest.mark.slow
    def test_commit_open_verify(self, kzg):
        scheme, setup = kzg
        r = scheme.r
        coeffs = [5, 0, 3, 1]                 # 1x^3 + 3x^2 + 5
        com = scheme.commit(coeffs, setup)
        z = 7
        value, proof = scheme.open(coeffs, z, setup)
        assert value == _poly_eval(coeffs, z, r)
        assert scheme.verify_dev(com, z, value, proof, setup)

    def test_wrong_value_rejected(self, kzg):
        scheme, setup = kzg
        coeffs = [2, 9, 4]
        com = scheme.commit(coeffs, setup)
        value, proof = scheme.open(coeffs, 5, setup)
        assert not scheme.verify_dev(com, 5, value + 1, proof, setup)

    def test_wrong_point_rejected(self, kzg):
        scheme, setup = kzg
        coeffs = [2, 9, 4]
        com = scheme.commit(coeffs, setup)
        value, proof = scheme.open(coeffs, 5, setup)
        assert not scheme.verify_dev(com, 6, value, proof, setup)

    def test_degree_bound_enforced(self, kzg):
        scheme, setup = kzg
        with pytest.raises(ValueError, match="degree"):
            scheme.commit(list(range(20)), setup)

    def test_real_pairing_verification(self, kzg):
        """Full KZG verify with the genuine BN254 pairing (no trapdoor)."""
        scheme, setup = kzg
        coeffs = [7, 1, 0, 2]
        com = scheme.commit(coeffs, setup)
        value, proof = scheme.open(coeffs, 11, setup)
        assert scheme.verify(com, 11, value, proof, setup)
        assert not scheme.verify(com, 11, value + 1, proof, setup)
        assert not scheme.verify(com, 12, value, proof, setup)


class TestFRI:
    @pytest.mark.slow
    def test_prove_verify_roundtrip(self):
        fri = FRIScheme(FRIConfig(domain_log=5, num_queries=6))
        coeffs = [3, 1, 4, 1, 5, 9, 2, 6]
        proof = fri.prove(coeffs)
        assert fri.verify(proof)

    @pytest.mark.slow
    def test_tampered_final_poly_rejected(self):
        fri = FRIScheme(FRIConfig(domain_log=5, num_queries=6))
        proof = fri.prove([3, 1, 4, 1, 5, 9, 2, 6])
        proof.final_poly[0] = (proof.final_poly[0] + 1) % fri.r
        assert not fri.verify(proof)

    @pytest.mark.slow
    def test_tampered_query_value_rejected(self):
        fri = FRIScheme(FRIConfig(domain_log=5, num_queries=4))
        proof = fri.prove([1, 2, 3, 4])
        proof.queries[0][0]["v0"] = (proof.queries[0][0]["v0"] + 1) % fri.r
        assert not fri.verify(proof)
