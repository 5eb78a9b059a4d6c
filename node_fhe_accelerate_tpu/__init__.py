"""node-fhe-accelerate-tpu: TPU-native FHE/ZK framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of
Digital-Defiance/node-fhe-accelerate, architected for TPU pod slices.
See SURVEY.md for the reference analysis and README.md for the layer map.

Public surface (mirrors the reference's TS API, src/index.ts):
"""
from .core.params import (
    ParameterSet, FHEScheme, SecurityLevel, Primes, create_parameter_set,
    TFHE_128_FAST, TFHE_128_BALANCED, TFHE_256_SECURE,
    BFV_128_SIMD, CKKS_128_ML, TFHE_128_VOTING,
)
from .core.poly import PolyRing
from .core.keys import (
    KeyManager, SecretKey, PublicKey, RelinKey, SecretKeyDistribution,
)
from .core.encrypt import EncryptionEngine, Ciphertext, Plaintext
from .core.rns import RnsEncryptionEngine, RnsPolyRing
from .core.ckks import CkksEngine, CkksEncoder, CkksCiphertext
from .core.keycache import BootstrapKeyCache
from .core.bootstrap import (
    TfheParams, TfheEngine, LweCiphertext, GlweCiphertext, BootstrapKey,
    TFHE_BOOT_128,
)
from .core.torus import TorusRing
from .core import threshold
from .core.streams import (
    CiphertextReadable, CiphertextWritable, TransformStream, AdditionStream,
    EncryptionStream, DecryptionStream, pipeline,
)
from .core.security import SecurityValidator
from .core import serializer
from .api.engine import FHEEngine, create_fhe_engine, HardwareCapabilities
from .api.context import FHEContext
from .api.voting import VotingSystem, ElectionState
from .api.tally import TallyStreamManager, TallyMessageAdapter
from .api.audit import AuditTrailManager, AuditOperation, AuditActor
from .api.fraud import FraudDetector
from .api.zk import ZKProofManager, ZKVerificationResult
from .api.ckks_context import CkksContext

__version__ = "0.1.0"

__all__ = [
    "ParameterSet", "FHEScheme", "SecurityLevel", "Primes",
    "create_parameter_set", "TFHE_128_FAST", "TFHE_128_BALANCED",
    "TFHE_256_SECURE", "BFV_128_SIMD", "CKKS_128_ML", "TFHE_128_VOTING",
    "PolyRing", "KeyManager", "SecretKey", "PublicKey", "RelinKey",
    "SecretKeyDistribution", "EncryptionEngine", "Ciphertext", "Plaintext",
    "TfheParams", "TfheEngine", "LweCiphertext", "GlweCiphertext",
    "BootstrapKey", "TFHE_BOOT_128", "TorusRing", "threshold",
    "SecurityValidator", "serializer", "FHEEngine", "create_fhe_engine",
    "HardwareCapabilities", "FHEContext", "VotingSystem", "ElectionState",
    "TallyStreamManager", "TallyMessageAdapter", "AuditTrailManager",
    "AuditOperation", "AuditActor", "FraudDetector",
    "CiphertextReadable", "CiphertextWritable", "TransformStream",
    "AdditionStream", "EncryptionStream", "DecryptionStream", "pipeline",
]
