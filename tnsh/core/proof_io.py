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


# -- verifier-enforced sound proofs (tnsh extension) -------------------------
#
#   MLOpening:       value 32B | n_quotients u64 | quotients (G1c each)
#   TwistSoundProof: magic 'TWSS' ver u32 | log_memory u64 | log_ops u64 |
#                    7 x G1c commitments | 8 x sumcheck | n_openings u64 |
#                    openings
#   ShoutSoundProof: magic 'SHSS' ver u32 | log_table u64 | log_lookups u64 |
#                    2 x G1c | 3 x sumcheck | 4 x MLOpening

def _ml_opening_to_bytes(opening) -> bytes:
    out = [opening.value.to_bytes_le()]
    out.append(struct.pack("<Q", len(opening.proof.quotients)))
    for q in opening.proof.quotients:
        out.append(g1_to_bytes(q, compress=True))
    return b"".join(out)


def _ml_opening_from_bytes(data: bytes, offset: int):
    from ..commit.mkzg import MLOpeningProof
    from ..protocols.sound import MLOpening

    value = fr_from_bytes(data[offset:offset + 32])
    offset += 32
    (n,) = struct.unpack_from("<Q", data, offset)
    offset += 8
    qs = []
    for _ in range(n):
        qs.append(g1_from_bytes(data[offset:offset + 32]))
        offset += 32
    return MLOpening(value, MLOpeningProof(qs)), offset


_TWIST_SOUND_SC_FIELDS = (
    "read_check", "val_check", "inc_check", "bool_ra_check",
    "bool_wa_check", "bool_ot_check", "rowsum_ra_check", "rowsum_wa_check",
)
_TWIST_SOUND_COMMITMENTS = (
    "ra_commitment", "wa_commitment", "inc_commitment", "val_commitment",
    "ot_commitment", "rv_commitment", "wv_commitment",
)


def twist_sound_proof_to_bytes(proof) -> bytes:
    out = [b"TWSS", struct.pack("<I", _VERSION)]
    out.append(struct.pack("<QQ", proof.log_memory, proof.log_ops))
    for name in _TWIST_SOUND_COMMITMENTS:
        out.append(g1_to_bytes(getattr(proof, name).commitment, compress=True))
    for name in _TWIST_SOUND_SC_FIELDS:
        out.append(sumcheck_proof_to_bytes(getattr(proof, name)))
    out.append(struct.pack("<Q", len(proof.openings)))
    for opening in proof.openings:
        out.append(_ml_opening_to_bytes(opening))
    return b"".join(out)


def twist_sound_proof_from_bytes(data: bytes):
    from ..protocols.sound import TwistSoundProof

    if data[:4] != b"TWSS":
        raise InvalidParametersError("bad proof magic (want b'TWSS')")
    (ver,) = struct.unpack_from("<I", data, 4)
    if ver != _VERSION:
        raise InvalidParametersError(f"unsupported proof version {ver}")
    offset = 8
    log_memory, log_ops = struct.unpack_from("<QQ", data, offset)
    offset += 16
    kwargs = {"log_memory": log_memory, "log_ops": log_ops}
    for name in _TWIST_SOUND_COMMITMENTS:
        kwargs[name] = KZGCommitmentValue(g1_from_bytes(data[offset:offset + 32]))
        offset += 32
    for name in _TWIST_SOUND_SC_FIELDS:
        kwargs[name], offset = sumcheck_proof_from_bytes(data, offset)
    (n_open,) = struct.unpack_from("<Q", data, offset)
    offset += 8
    openings = []
    for _ in range(n_open):
        opening, offset = _ml_opening_from_bytes(data, offset)
        openings.append(opening)
    kwargs["openings"] = openings
    return TwistSoundProof(**kwargs)


def shout_sound_proof_to_bytes(proof) -> bytes:
    out = [b"SHSS", struct.pack("<I", _VERSION)]
    out.append(struct.pack("<QQ", proof.log_table, proof.log_lookups))
    out.append(g1_to_bytes(proof.ra_commitment.commitment, compress=True))
    out.append(g1_to_bytes(proof.rv_commitment.commitment, compress=True))
    for sc in (proof.read_check, proof.bool_check, proof.onehot_check):
        out.append(sumcheck_proof_to_bytes(sc))
    for opening in (proof.rv_at_rho, proof.ra_at_read, proof.ra_at_bool,
                    proof.ra_at_onehot):
        out.append(_ml_opening_to_bytes(opening))
    return b"".join(out)


def shout_sound_proof_from_bytes(data: bytes):
    from ..protocols.sound import ShoutSoundProof

    if data[:4] != b"SHSS":
        raise InvalidParametersError("bad proof magic (want b'SHSS')")
    (ver,) = struct.unpack_from("<I", data, 4)
    if ver != _VERSION:
        raise InvalidParametersError(f"unsupported proof version {ver}")
    offset = 8
    log_table, log_lookups = struct.unpack_from("<QQ", data, offset)
    offset += 16
    c_ra = KZGCommitmentValue(g1_from_bytes(data[offset:offset + 32]))
    offset += 32
    c_rv = KZGCommitmentValue(g1_from_bytes(data[offset:offset + 32]))
    offset += 32
    scs = []
    for _ in range(3):
        sc, offset = sumcheck_proof_from_bytes(data, offset)
        scs.append(sc)
    opens = []
    for _ in range(4):
        opening, offset = _ml_opening_from_bytes(data, offset)
        opens.append(opening)
    return ShoutSoundProof(
        log_table=log_table,
        log_lookups=log_lookups,
        ra_commitment=c_ra,
        rv_commitment=c_rv,
        read_check=scs[0],
        bool_check=scs[1],
        onehot_check=scs[2],
        rv_at_rho=opens[0],
        ra_at_read=opens[1],
        ra_at_bool=opens[2],
        ra_at_onehot=opens[3],
    )


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
