"""Proof and parameter serialization (checkpoint/interop).

The reference has no proof serialization beyond the ark CanonicalSerialize
impls on KZG values (SURVEY §5 checkpoint row; commitments.rs:106-154).
tnsh provides a complete, versioned byte format built from ark-compatible
primitives: Fr as 32-byte LE, G1 compressed as 32 bytes with ark flag bits
(tnsh.core.serialize).  Layout (all lengths little-endian u64):

  SumCheckProof:  n_rounds | rounds (n_rounds x fr_vec) | final_evaluation
  TwistProof:     magic 'TWST' ver u32 | 2 x G1c | sumcheck | proofs_vec | evals_vec
  ShoutProof:     magic 'SHOT' ver u32 | same shape
  VerifierParams: magic 'TNVK' ver u32 | log_size u64 | max_ops u64 |
                  fiat_shamir_seed 32B | g1_generator G1c | g2_generator G2c |
                  g2_tau G2c
"""

from __future__ import annotations

import struct
from typing import List, Tuple

from ..commit.kzg import KZGCommitmentValue, KZGProof
from ..errors import InvalidParametersError
from ..field.fr import Fr
from ..iop.sumcheck import SumCheckProof
from .params import CommitmentVerificationKey, VerifierParams
from .serialize import (
    fr_from_bytes,
    g1_from_bytes,
    g1_to_bytes,
    g2_from_bytes,
    g2_to_bytes,
    read_fr_vec,
    write_fr_vec,
)

_VERSION = 1


# -- sum-check --------------------------------------------------------------

def sumcheck_proof_to_bytes(proof: SumCheckProof) -> bytes:
    out = [struct.pack("<Q", len(proof.round_polynomials))]
    for rp in proof.round_polynomials:
        out.append(write_fr_vec(rp))
    out.append(proof.final_evaluation.to_bytes_le())
    return b"".join(out)


def sumcheck_proof_from_bytes(data: bytes, offset: int = 0) -> Tuple[SumCheckProof, int]:
    (n,) = struct.unpack_from("<Q", data, offset)
    offset += 8
    rounds: List[List[Fr]] = []
    for _ in range(n):
        rp, offset = read_fr_vec(data, offset)
        rounds.append(rp)
    final = fr_from_bytes(data[offset:offset + 32])
    offset += 32
    return SumCheckProof(rounds, final), offset


# -- protocol proofs --------------------------------------------------------

def _write_proof(magic: bytes, c1, c2, sc: SumCheckProof, openings, evals) -> bytes:
    out = [magic, struct.pack("<I", _VERSION)]
    out.append(g1_to_bytes(c1.commitment, compress=True))
    out.append(g1_to_bytes(c2.commitment, compress=True))
    out.append(sumcheck_proof_to_bytes(sc))
    out.append(struct.pack("<Q", len(openings)))
    for pi in openings:
        out.append(g1_to_bytes(pi.proof, compress=True))
    out.append(write_fr_vec(evals))
    return b"".join(out)


def _read_proof(magic: bytes, data: bytes):
    if data[:4] != magic:
        raise InvalidParametersError(f"bad proof magic (want {magic!r})")
    (ver,) = struct.unpack_from("<I", data, 4)
    if ver != _VERSION:
        raise InvalidParametersError(f"unsupported proof version {ver}")
    offset = 8
    c1 = KZGCommitmentValue(g1_from_bytes(data[offset:offset + 32]))
    offset += 32
    c2 = KZGCommitmentValue(g1_from_bytes(data[offset:offset + 32]))
    offset += 32
    sc, offset = sumcheck_proof_from_bytes(data, offset)
    (n_open,) = struct.unpack_from("<Q", data, offset)
    offset += 8
    openings = []
    for _ in range(n_open):
        openings.append(KZGProof(g1_from_bytes(data[offset:offset + 32])))
        offset += 32
    evals, offset = read_fr_vec(data, offset)
    return c1, c2, sc, openings, evals, offset


def twist_proof_to_bytes(proof) -> bytes:
    return _write_proof(
        b"TWST",
        proof.address_commitment,
        proof.value_commitment,
        proof.consistency_proof,
        proof.opening_proofs,
        proof.final_evaluations,
    )


def twist_proof_from_bytes(data: bytes):
    from ..protocols.twist import TwistProof

    c1, c2, sc, openings, evals, _ = _read_proof(b"TWST", data)
    return TwistProof(c1, c2, sc, openings, evals)


def shout_proof_to_bytes(proof) -> bytes:
    return _write_proof(
        b"SHOT",
        proof.table_commitment,
        proof.index_commitment,
        proof.lookup_proof,
        proof.opening_proofs,
        proof.final_evaluations,
    )


def shout_proof_from_bytes(data: bytes):
    from ..protocols.shout import ShoutProof

    c1, c2, sc, openings, evals, _ = _read_proof(b"SHOT", data)
    return ShoutProof(c1, c2, sc, openings, evals)


# -- verifier params --------------------------------------------------------

def verifier_params_to_bytes(vp: VerifierParams) -> bytes:
    out = [b"TNVK", struct.pack("<I", _VERSION)]
    out.append(struct.pack("<QQ", vp.log_size, vp.max_operations))
    out.append(vp.fiat_shamir_seed)
    out.append(g1_to_bytes(vp.commitment_vk.g1_generator, compress=True))
    out.append(g2_to_bytes(vp.commitment_vk.g2_generator, compress=True))
    out.append(g2_to_bytes(vp.commitment_vk.g2_tau, compress=True))
    return b"".join(out)


def verifier_params_from_bytes(data: bytes) -> VerifierParams:
    if data[:4] != b"TNVK":
        raise InvalidParametersError("bad verifier-params magic")
    (ver,) = struct.unpack_from("<I", data, 4)
    if ver != _VERSION:
        raise InvalidParametersError(f"unsupported params version {ver}")
    log_size, max_ops = struct.unpack_from("<QQ", data, 8)
    offset = 24
    seed = data[offset:offset + 32]
    offset += 32
    g1_gen = g1_from_bytes(data[offset:offset + 32])
    offset += 32
    g2_gen = g2_from_bytes(data[offset:offset + 64])
    offset += 64
    g2_tau = g2_from_bytes(data[offset:offset + 64])
    return VerifierParams(
        log_size=log_size,
        max_operations=max_ops,
        commitment_vk=CommitmentVerificationKey(
            g1_generator=g1_gen, g2_generator=g2_gen, g2_tau=g2_tau
        ),
        fiat_shamir_seed=seed,
    )
