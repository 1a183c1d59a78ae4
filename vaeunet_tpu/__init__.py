"""vaeunet_tpu — a TPU-native (JAX/XLA/Pallas) segmentation framework.

A ground-up rebuild of the capabilities of tmuird/VAEUNET (a milesial
Pytorch-UNet derivative with a variational bottleneck for uncertainty
quantification) designed TPU-first:

- NHWC layouts everywhere (TPU-native), bf16 mixed precision policies
- one jit'd train step, functional train state, explicit PRNG threading
- Pallas kernels for fused hot ops, XLA `conv_general_dilated` elsewhere
- `jax.sharding.Mesh` + `shard_map` data parallelism over ICI
- tiled sliding-window full-resolution inference with feathered blending
- vmap'd N-sample latent ensembles for uncertainty maps

Reference parity map (file:line cites into the reference snapshot):
- models.unet      <- unet/unet_model.py, unet/unet_parts.py
- models.vae_unet  <- unet/unet_resnet.py
- losses           <- utils/loss.py
- metrics          <- utils/metrics.py
- uncertainty      <- utils/uncertainty_metrics.py, utils/vae_utils.py
- data             <- utils/data_loading.py
- training         <- train.py, evaluate.py
- inference        <- visualize_vae.py (predict_with_patches / predict_full_image)
- analysis         <- analyze_model.py, visualize_vae.py
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: full-model compiles take minutes on
# remote/tunneled TPU backends; cached re-runs start in seconds.  Opt out
# with VAEUNET_TPU_NO_CACHE=1 or point elsewhere with JAX_COMPILATION_CACHE_DIR.
import os as _os

# Honor JAX_PLATFORMS even under out-of-tree backend plugins that ignore the
# env var (the tunneled axon TPU plugin does): a user exporting
# JAX_PLATFORMS=cpu means "do not touch the accelerator", and silently
# attaching to a remote TPU instead is both wrong and (on this tunnel)
# hazardous — rapid attach/detach cycles wedge it.  jax.config.update is the
# binding route the plugin does respect.
if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        # Rebind only when the current config still looks like the ambient
        # default: out-of-tree plugin site hooks expand the env var into a
        # list (e.g. JAX_PLATFORMS=cpu -> config "axon,cpu"), which silently
        # re-enables the accelerator the user opted out of.  A prior explicit
        # jax.config.update to something NOT containing the env platform
        # (e.g. a test harness forcing "cpu" under an exported
        # JAX_PLATFORMS=axon) must win over the env var.
        _env = _os.environ["JAX_PLATFORMS"]
        _cur = getattr(_jax.config, "jax_platforms", None)
        if not _cur or (_env in str(_cur).split(",") and _cur != _env):
            _jax.config.update("jax_platforms", _env)
    except Exception:  # backend already initialized — too late, leave it
        pass

if not _os.environ.get("VAEUNET_TPU_NO_CACHE"):
    import jax as _jax

    _cache = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), ".jax_cache"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # unknown config on exotic jax builds — non-fatal
        pass
