"""Public election verification: re-verify everything from an exported
package.

Twin of the reference's `PublicVerifier` + CLI
(src/verification/public-verifier.ts:143-780, src/verification/cli.ts:271):
loads a `VerificationPackage`, re-verifies each ballot's validity proof,
nullifier uniqueness, the audit hash chain, and the tally consistency;
emits progress callbacks and JSON/HTML reports.
"""
from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

__all__ = ["VerificationPackage", "VerificationResult", "PublicVerifier"]


@dataclass
class VerificationPackage:
    """Everything a third party needs to re-verify an election."""
    election_id: str
    num_candidates: int
    ballots: list                 # api.voting.Ballot objects
    audit_json: str
    decrypted_tally: Optional[list] = None
    bp_gens: object = None
    range_bits: int = 8

    @classmethod
    def from_voting_system(cls, vs) -> "VerificationPackage":
        return cls(
            election_id=vs.election_id,
            num_candidates=vs.num_candidates,
            ballots=list(vs._ballots),
            audit_json=vs.export_audit_trail(),
            decrypted_tally=[int(x) for x in vs._decrypted_tally]
            if vs._decrypted_tally is not None else None,
            bp_gens=getattr(vs, "bp_gens", None),
            range_bits=vs.RANGE_BITS,
        )


@dataclass
class VerificationResult:
    valid: bool
    ballots_checked: int = 0
    ballots_valid: int = 0
    audit_valid: bool = False
    nullifiers_unique: bool = False
    tally_consistent: bool = True
    failures: list = field(default_factory=list)
    elapsed_s: float = 0.0


class PublicVerifier:
    """(public-verifier.ts:143)"""

    def __init__(self, progress: Optional[Callable[[int, int, str], None]]
                 = None):
        self.progress = progress

    def verify_all(self, pkg: VerificationPackage) -> VerificationResult:
        from .audit import AuditTrailManager
        from ..zk.bulletproofs import BulletproofsVerifier

        t0 = time.perf_counter()
        res = VerificationResult(valid=True)

        # 1. audit chain
        audit = AuditTrailManager.import_json(pkg.audit_json)
        res.audit_valid, bad = audit.verify_integrity()
        if not res.audit_valid:
            res.valid = False
            res.failures.append(f"audit chain broken at entries {bad}")

        # 2. nullifier uniqueness
        nulls = [b.nullifier for b in pkg.ballots]
        res.nullifiers_unique = len(nulls) == len(set(nulls))
        if not res.nullifiers_unique:
            res.valid = False
            res.failures.append("duplicate nullifiers detected")

        # 3. ballot validity proofs
        verifier = BulletproofsVerifier() if pkg.bp_gens is not None else None
        total = len(pkg.ballots)
        for i, b in enumerate(pkg.ballots):
            if self.progress:
                self.progress(i, total, "verifying ballots")
            res.ballots_checked += 1
            if b.validity_proof is None:
                res.ballots_valid += 1        # zk disabled for this election
                continue
            ok = verifier.verify_range(b.validity_commitment,
                                       b.validity_proof, pkg.range_bits,
                                       pkg.bp_gens)
            if ok:
                res.ballots_valid += 1
            else:
                res.valid = False
                res.failures.append(f"ballot {b.ballot_id}: invalid proof")

        # 4. tally consistency: counts must sum to ballot count
        if pkg.decrypted_tally is not None:
            if sum(pkg.decrypted_tally) != len(pkg.ballots):
                res.tally_consistent = False
                res.valid = False
                res.failures.append(
                    f"tally sum {sum(pkg.decrypted_tally)} != "
                    f"{len(pkg.ballots)} ballots")

        res.elapsed_s = time.perf_counter() - t0
        if self.progress:
            self.progress(total, total, "done")
        return res

    # -- reports (public-verifier.ts:692-773) --------------------------------
    @staticmethod
    def json_report(pkg: VerificationPackage, res: VerificationResult) -> str:
        return json.dumps({
            "electionId": pkg.election_id,
            "valid": res.valid,
            "ballotsChecked": res.ballots_checked,
            "ballotsValid": res.ballots_valid,
            "auditValid": res.audit_valid,
            "nullifiersUnique": res.nullifiers_unique,
            "tallyConsistent": res.tally_consistent,
            "failures": res.failures,
            "elapsedSeconds": res.elapsed_s,
        }, indent=2)

    @staticmethod
    def html_report(pkg: VerificationPackage, res: VerificationResult) -> str:
        status = "VALID" if res.valid else "INVALID"
        rows = "".join(
            f"<li>{f}</li>" for f in res.failures) or "<li>none</li>"
        return (
            f"<html><body><h1>Election {pkg.election_id}: {status}</h1>"
            f"<p>Ballots: {res.ballots_valid}/{res.ballots_checked} valid</p>"
            f"<p>Audit chain: {'ok' if res.audit_valid else 'BROKEN'}</p>"
            f"<p>Failures:</p><ul>{rows}</ul></body></html>")
