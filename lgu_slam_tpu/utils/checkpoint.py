"""Checkpoint IO + reference-weight conversion.

- :func:`save_params` / :func:`load_params`: native pickle checkpoints.
- :func:`convert_torch_checkpoint`: map a reference LGU-SLAM ``.pth``
  state-dict (torch, OIHW convs) onto the LGUNet parameter tree (flax,
  HWIO convs), including the ``module.`` prefix strip and the 2-channel
  trimming of the weight/delta heads that the reference applies at load
  time (droid.py:50-56).
"""

from __future__ import annotations

import pickle

import numpy as np


def save_params(path, params):
    with open(path, "wb") as f:
        pickle.dump({"params": params}, f)


def load_params(path):
    with open(path, "rb") as f:
        return pickle.load(f)["params"]


def save_train_state(path, params, opt_state, step, rng_state=None):
    """Full training checkpoint: params + optimizer state + step counter +
    host RNG state, so a killed run resumes exactly (including the
    OneCycle schedule position, which lives in the optax counter inside
    ``opt_state``).  The reference saves params only (train.py:181-184)
    and cannot resume its schedule.
    """
    import jax  # noqa: PLC0415

    with open(path, "wb") as f:
        pickle.dump(
            {
                "params": jax.device_get(params),
                "opt_state": jax.device_get(opt_state),
                "step": int(step),
                "rng_state": rng_state,
            },
            f,
        )


def load_train_state(path):
    """Returns (params, opt_state | None, step, rng_state | None).

    Accepts both full training checkpoints and legacy params-only ones
    (``{"params": ...}``).
    """
    with open(path, "rb") as f:
        d = pickle.load(f)
    return (
        d["params"],
        d.get("opt_state"),
        int(d.get("step", 0)),
        d.get("rng_state"),
    )


def _conv(w, b=None):
    """torch OIHW -> flax HWIO."""
    out = {"kernel": np.transpose(np.asarray(w), (2, 3, 1, 0))}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def _dense(w, b=None):
    out = {"kernel": np.transpose(np.asarray(w), (1, 0))}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def _kan(sd, prefix, grid_size=3, spline_order=3, grid_range=(-1.0, 1.0)):
    # the JAX KANLinear hard-codes a uniform grid; a checkpoint whose grid
    # was adapted via the reference's update_grid() would otherwise load
    # silently wrong — fail loudly instead (advisor finding).
    if prefix + "grid" in sd:
        g = np.asarray(sd[prefix + "grid"])
        h = (grid_range[1] - grid_range[0]) / grid_size
        uniform = (
            np.arange(-spline_order, grid_size + spline_order + 1) * h
            + grid_range[0]
        ).astype(np.float32)
        if not np.allclose(g, uniform[None, :], atol=1e-5):
            raise ValueError(
                f"{prefix}grid was adapted (update_grid); the JAX KANLinear "
                "only supports the uniform grid — re-export the checkpoint "
                "without grid adaptation or refit with "
                "lgu_slam_tpu.models.kan grid utilities"
            )
    return {
        "base_weight": np.transpose(np.asarray(sd[prefix + "base_weight"]), (1, 0)),
        "spline_weight": np.transpose(
            np.asarray(sd[prefix + "spline_weight"]), (1, 2, 0)
        ),
        "spline_scaler": np.transpose(
            np.asarray(sd[prefix + "spline_scaler"]), (1, 0)
        ),
    }


def _encoder(sd, prefix):
    p = {
        "conv1": _conv(sd[prefix + "conv1.weight"], sd[prefix + "conv1.bias"]),
        "conv2": _conv(sd[prefix + "conv2.weight"], sd[prefix + "conv2.bias"]),
    }
    for stage in (1, 2, 3):
        for blk in (0, 1):
            src = f"{prefix}layer{stage}.{blk}."
            dst = {}
            dst["conv1"] = _conv(sd[src + "conv1.weight"], sd[src + "conv1.bias"])
            dst["conv2"] = _conv(sd[src + "conv2.weight"], sd[src + "conv2.bias"])
            if src + "downsample.0.weight" in sd:
                dst["downsample"] = _conv(
                    sd[src + "downsample.0.weight"],
                    sd[src + "downsample.0.bias"],
                )
            p[f"layer{stage}_{blk}"] = dst
    return p


def convert_torch_checkpoint(path_or_state):
    """Load a reference ``.pth`` and return an LGUNet params dict."""
    if isinstance(path_or_state, (str, bytes)):
        import torch  # noqa: PLC0415 — cpu torch, load only

        sd = torch.load(path_or_state, map_location="cpu",
                        weights_only=False)
    else:
        sd = path_or_state
    sd = { (k[7:] if k.startswith("module.") else k): v for k, v in sd.items() }
    sd = {k: np.asarray(v) for k, v in sd.items()}

    # head trimming (droid.py:53-56)
    for head in ("update.weight.2", "update.delta.2"):
        sd[head + ".weight"] = sd[head + ".weight"][:2]
        sd[head + ".bias"] = sd[head + ".bias"][:2]

    params = {
        "fnet": _encoder(sd, "fnet."),
        "cnet": _encoder(sd, "cnet."),
        "ga": {
            "map": _dense(sd["GA.map.weight"], sd["GA.map.bias"]),
            "meanMap": _dense(sd["GA.meanMap.weight"], sd["GA.meanMap.bias"]),
            "covMap": _dense(sd["GA.covMap.weight"], sd["GA.covMap.bias"]),
        },
        "ofs_map": _conv(sd["ofsMap.weight"], sd["ofsMap.bias"]),
        "ofs_residual": _conv(
            sd["ofs_residual.weight"], sd["ofs_residual.bias"]
        ),
        "update": {
            "corr_enc1": _conv(
                sd["update.corr_encoder.0.weight"],
                sd["update.corr_encoder.0.bias"],
            ),
            "corr_enc2": _conv(
                sd["update.corr_encoder.2.weight"],
                sd["update.corr_encoder.2.bias"],
            ),
            "flow_enc1": _conv(
                sd["update.flow_encoder.0.weight"],
                sd["update.flow_encoder.0.bias"],
            ),
            "flow_enc2": _conv(
                sd["update.flow_encoder.2.weight"],
                sd["update.flow_encoder.2.bias"],
            ),
            "weight1": _conv(
                sd["update.weight.0.weight"], sd["update.weight.0.bias"]
            ),
            "weight2": _conv(
                sd["update.weight.2.weight"], sd["update.weight.2.bias"]
            ),
            "delta1": _conv(
                sd["update.delta.0.weight"], sd["update.delta.0.bias"]
            ),
            "delta2": _conv(
                sd["update.delta.2.weight"], sd["update.delta.2.bias"]
            ),
            "gru": {
                "convz": _conv(
                    sd["update.gru.convz.weight"], sd["update.gru.convz.bias"]
                ),
                "convr": _conv(
                    sd["update.gru.convr.weight"], sd["update.gru.convr.bias"]
                ),
                "convq": _conv(
                    sd["update.gru.convq.weight"], sd["update.gru.convq.bias"]
                ),
                "w": _conv(
                    sd["update.gru.w.weight"], sd["update.gru.w.bias"]
                ),
                "kanz_glo": _kan(sd, "update.gru.kanz_glo."),
                "kanr_glo": _kan(sd, "update.gru.kanr_glo."),
                "kanq_glo": _kan(sd, "update.gru.kanq_glo."),
            },
            "agg": {
                "conv1": _conv(
                    sd["update.agg.conv1.weight"], sd["update.agg.conv1.bias"]
                ),
                "conv2": _conv(
                    sd["update.agg.conv2.weight"], sd["update.agg.conv2.bias"]
                ),
                "eta": _conv(
                    sd["update.agg.eta.0.weight"], sd["update.agg.eta.0.bias"]
                ),
                "upmask": _conv(
                    sd["update.agg.upmask.0.weight"],
                    sd["update.agg.upmask.0.bias"],
                ),
            },
        },
    }
    return params
