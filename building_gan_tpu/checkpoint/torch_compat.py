"""Converter between this framework's checkpoints and torch ``states.pt``.

BASELINE.json asks for "same ``states.pt``-equivalent serialization".  The
native checkpoint is flax-msgpack (`ckpt.py`); this module maps generator /
discriminator parameters to and from the reference's torch ``state_dict``
key layout (`building_gan/src/models.py`) so a user can port weights either
direction.

Key mapping (generator; discriminator analogous):

    reference torch key                      flax path
    ---------------------------------------  ---------------------------------
    matched_features_encoder.{3i}.weight     matched_enc_i/dense/kernel (T)
    matched_features_encoder.{3i}.bias       matched_enc_i/dense/bias
    matched_features_encoder.{3i+1}.*        matched_enc_i/norm/{scale,bias}
    mlp_encoder.{3i}.*                       mlp_enc_i/dense/*
    encoder.module_{4i}.lin.weight           encoder/conv_i/lin/kernel (T)
    encoder.module_{4i}.att_src              encoder/conv_i/att_src
    encoder.module_{4i}.bias                 encoder/conv_i/bias
    encoder.module_{4i+1}.weight             encoder/norm_i/weight
    encoder.module_{4i+1}.mean_scale         encoder/norm_i/mean_scale
    decoder.{3i}.weight                      dec_i/dense/kernel (T)
    decoder.12.weight                        dec_out/kernel (T)

(T) = torch Linear stores (out, in); flax Dense stores (in, out) — transposed
on conversion.  Only the GATCONV single-head layout is mapped (the reference
run of record); other conv types raise.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _flatten(tree, prefix=()) -> Dict[tuple, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[tuple, np.ndarray]) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def generator_params_to_torch(params: dict, cfg) -> Dict[str, np.ndarray]:
    """Flax generator params -> reference torch state_dict arrays."""
    if cfg.GENERATOR_CONV_TYPE != "GATCONV":
        raise NotImplementedError("torch conversion implemented for GATCONV only")
    flat = _flatten(params)
    out: Dict[str, np.ndarray] = {}
    for path, v in flat.items():
        name = path[0]
        if name.startswith("matched_enc_"):
            i = int(name.split("_")[-1])
            base = f"matched_features_encoder.{3 * i}"
            if path[1] == "dense":
                out[f"{base}.weight" if path[2] == "kernel" else f"{base}.bias"] = (
                    v.T if path[2] == "kernel" else v
                )
            else:  # norm
                base = f"matched_features_encoder.{3 * i + 1}"
                out[f"{base}.weight" if path[2] == "scale" else f"{base}.bias"] = v
        elif name.startswith("mlp_enc_"):
            i = int(name.split("_")[-1])
            if path[1] == "dense":
                base = f"mlp_encoder.{3 * i}"
                out[f"{base}.weight" if path[2] == "kernel" else f"{base}.bias"] = (
                    v.T if path[2] == "kernel" else v
                )
            else:
                base = f"mlp_encoder.{3 * i + 1}"
                out[f"{base}.weight" if path[2] == "scale" else f"{base}.bias"] = v
        elif name == "encoder":
            sub = path[1]
            kind, i = sub.rsplit("_", 1)
            i = int(i)
            if kind == "conv":
                base = f"encoder.module_{4 * i}"
                if path[2] == "lin":
                    out[f"{base}.lin.weight"] = v.T
                elif path[2] == "att_src":
                    out[f"{base}.att_src"] = v.T[None]  # torch: (1, heads=1, C)
                elif path[2] == "att_dst":
                    out[f"{base}.att_dst"] = v.T[None]
                elif path[2] == "bias":
                    out[f"{base}.bias"] = v
            else:  # norm
                base = f"encoder.module_{4 * i + 1}"
                out[f"{base}.{path[2]}"] = v
        elif name.startswith("dec_"):
            if name == "dec_out":
                out["decoder.12.weight" if path[1] == "kernel" else "decoder.12.bias"] = (
                    v.T if path[1] == "kernel" else v
                )
            else:
                i = int(name.split("_")[-1])
                if path[1] == "dense":
                    base = f"decoder.{3 * i}"
                    out[f"{base}.weight" if path[2] == "kernel" else f"{base}.bias"] = (
                        v.T if path[2] == "kernel" else v
                    )
                else:
                    base = f"decoder.{3 * i + 1}"
                    out[f"{base}.weight" if path[2] == "scale" else f"{base}.bias"] = v
        else:
            raise KeyError(f"unmapped generator param {path}")
    return out


def torch_to_generator_params(state_dict: Dict[str, np.ndarray], cfg, template: dict) -> dict:
    """Reference torch state_dict -> flax generator params (inverse mapping)."""
    torch_like = generator_params_to_torch(template, cfg)
    missing = set(torch_like) - set(state_dict)
    if missing:
        raise KeyError(f"torch state_dict missing keys, e.g. {sorted(missing)[:3]}")
    flat_template = _flatten(template)
    inverse: Dict[tuple, np.ndarray] = {}
    # rebuild by replaying the forward mapping path-by-path
    for path, v in flat_template.items():
        single = _unflatten({path: v})
        [(torch_key, mapped)] = generator_params_to_torch(single, cfg).items()
        loaded = np.asarray(state_dict[torch_key])
        if mapped.shape != loaded.shape:
            raise ValueError(f"shape mismatch for {torch_key}: {mapped.shape} vs {loaded.shape}")
        # undo the torch-side transforms
        if path[-1] == "kernel":
            loaded = loaded.T
        elif path[-1] in ("att_src", "att_dst"):
            loaded = loaded[0].T
        inverse[path] = loaded.astype(v.dtype)
    return _unflatten(inverse)


def discriminator_params_to_torch(params: dict, cfg) -> Dict[str, np.ndarray]:
    """Flax discriminator params -> reference torch state_dict arrays.

    Reference layout (`models.py:177-225`): ``mlp_encoder.{0,2}`` (Linear,
    ReLU interleaved), ``encoder.module_{4i}`` convs / ``module_{4i+1}``
    GraphNorms, ``decoder.{0,2,4,6}`` Linears.
    """
    if cfg.DISCRIMINATOR_CONV_TYPE != "GATCONV":
        raise NotImplementedError("torch conversion implemented for GATCONV only")
    flat = _flatten(params)
    out: Dict[str, np.ndarray] = {}
    for path, v in flat.items():
        name = path[0]
        if name.startswith("mlp_"):
            i = int(name.split("_")[-1])
            base = f"mlp_encoder.{2 * i}"
            out[f"{base}.weight" if path[1] == "kernel" else f"{base}.bias"] = (
                v.T if path[1] == "kernel" else v
            )
        elif name == "encoder":
            kind, i = path[1].rsplit("_", 1)
            i = int(i)
            if kind == "conv":
                base = f"encoder.module_{4 * i}"
                if path[2] == "lin":
                    out[f"{base}.lin.weight"] = v.T
                elif path[2] in ("att_src", "att_dst"):
                    out[f"{base}.{path[2]}"] = v.T[None]
                elif path[2] == "bias":
                    out[f"{base}.bias"] = v
            else:
                out[f"encoder.module_{4 * i + 1}.{path[2]}"] = v
        elif name == "dec_out":
            out["decoder.6.weight" if path[1] == "kernel" else "decoder.6.bias"] = (
                v.T if path[1] == "kernel" else v
            )
        elif name.startswith("dec_"):
            i = int(name.split("_")[-1])
            base = f"decoder.{2 * i}"
            out[f"{base}.weight" if path[1] == "kernel" else f"{base}.bias"] = (
                v.T if path[1] == "kernel" else v
            )
        else:
            raise KeyError(f"unmapped discriminator param {path}")
    return out


def torch_to_discriminator_params(state_dict: Dict[str, np.ndarray], cfg, template: dict) -> dict:
    """Reference torch state_dict -> flax discriminator params."""
    flat_template = _flatten(template)
    inverse: Dict[tuple, np.ndarray] = {}
    for path, v in flat_template.items():
        single = _unflatten({path: v})
        [(torch_key, mapped)] = discriminator_params_to_torch(single, cfg).items()
        loaded = np.asarray(state_dict[torch_key])
        if mapped.shape != loaded.shape:
            raise ValueError(f"shape mismatch for {torch_key}: {mapped.shape} vs {loaded.shape}")
        if path[-1] == "kernel":
            loaded = loaded.T
        elif path[-1] in ("att_src", "att_dst"):
            loaded = loaded[0].T
        inverse[path] = loaded.astype(v.dtype)
    return _unflatten(inverse)


def save_torch_states(path: str, trainer) -> None:
    """Write a torch ``states.pt``-layout checkpoint (requires torch)."""
    import torch

    gen_sd = {
        k: torch.tensor(np.asarray(v))
        for k, v in generator_params_to_torch(trainer.state.params_g, trainer.configuration).items()
    }
    disc_sd = {
        k: torch.tensor(np.asarray(v))
        for k, v in discriminator_params_to_torch(
            trainer.state.params_d, trainer.configuration
        ).items()
    }
    states = dict(trainer.meta)
    states["generator"] = gen_sd
    states["discriminator"] = disc_sd
    torch.save(states, path)
