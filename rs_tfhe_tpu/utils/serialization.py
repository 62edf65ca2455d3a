"""Key serialization: save/load SecretKey and CloudKey to .npz archives.

The reference has no persistence at all — keys exist only in memory and a
CloudKey takes minutes to generate serially (rs-tfhe key.rs; SURVEY.md §5).
Here keys are flat pytrees of arrays, so checkpoint/resume is a plain
compressed-archive round trip; parameters are stored alongside so a loaded
key reconstructs its exact TfheParams.
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from ..key import CloudKey, SecretKey
from ..params import TfheParams, TlweParams, TrgswParams, TrlweParams

#: v2: ksk_limbs moved from interleaved [rows, (n0+1)*4] to planar-padded
#: [rows, 4*lane_pad(n0+1)] (tlwe.lwe_encrypt_rows_limbs layout)
_FORMAT_VERSION = 2


def params_to_dict(params: TfheParams) -> dict:
    return dataclasses.asdict(params)


def params_from_dict(d: dict) -> TfheParams:
    return TfheParams(
        security_bits=d["security_bits"],
        description=d["description"],
        tlwe_lv0=TlweParams(**d["tlwe_lv0"]),
        tlwe_lv1=TlweParams(**d["tlwe_lv1"]),
        trlwe_lv1=TrlweParams(**d["trlwe_lv1"]),
        trgsw_lv1=TrgswParams(**d["trgsw_lv1"]),
        bsk_round_bits=d.get("bsk_round_bits", 0),  # absent in v1 files
    )


def save_secret_key(path, sk: SecretKey) -> None:
    np.savez_compressed(
        path,
        version=_FORMAT_VERSION,
        kind="secret",
        params=json.dumps(params_to_dict(sk.params)),
        lv0=np.asarray(sk.lv0),
        lv1=np.asarray(sk.lv1),
    )


def load_secret_key(path) -> SecretKey:
    with np.load(path, allow_pickle=False) as z:
        _check(z, "secret")
        params = params_from_dict(json.loads(str(z["params"])))
        return SecretKey(
            lv0=jnp.asarray(z["lv0"]), lv1=jnp.asarray(z["lv1"]), params=params
        )


def save_cloud_key(path, ck: CloudKey) -> None:
    """~100 MB compressed at SECURITY_128_BIT. bsk_packed/bsk_vecs are never
    stored — both are derived from bsk and rebuilt at load."""
    np.savez_compressed(
        path,
        version=_FORMAT_VERSION,
        kind="cloud",
        params=json.dumps(params_to_dict(ck.params)),
        testvec=np.asarray(ck.testvec),
        ksk_limbs=np.asarray(ck.ksk_limbs),
        bsk=np.asarray(ck.bsk),
    )


def load_cloud_key(path) -> CloudKey:
    with np.load(path, allow_pickle=False) as z:
        _check(z, "cloud")
        params = params_from_dict(json.loads(str(z["params"])))
        bsk = jnp.asarray(z["bsk"])
        from ..ops.pallas_blind_rotate import (
            prepare_bsk_limbs,
            prepare_bsk_vecs,
            small_param_ok,
        )

        return CloudKey(
            testvec=jnp.asarray(z["testvec"]),
            ksk_limbs=jnp.asarray(z["ksk_limbs"]),
            bsk=bsk,
            params=params,
            bsk_packed=prepare_bsk_limbs(bsk),
            bsk_vecs=(
                prepare_bsk_vecs(bsk, drop_limbs=params.bsk_round_bits // 8)
                if small_param_ok(params)
                else None
            ),
        )


def _check(z, kind: str) -> None:
    v = int(z["version"])
    if v != _FORMAT_VERSION:
        raise ValueError(f"unsupported key format version {v}")
    if str(z["kind"]) != kind:
        raise ValueError(f"expected a {kind} key, found {z['kind']}")
