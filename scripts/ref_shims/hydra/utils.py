import importlib


def _resolve(target: str):
    module_name, _, attr = target.rpartition(".")
    for candidate in (module_name, f"marlbase.{module_name}"):
        try:
            return getattr(importlib.import_module(candidate), attr)
        except ImportError:
            continue
    raise ImportError(f"cannot resolve _target_: {target}")


def instantiate(config, *args, **kwargs):
    target = config["_target_"]
    call_kwargs = {
        k: config[k] for k in config.keys() if not str(k).startswith("_")
    }
    call_kwargs.update(kwargs)
    return _resolve(target)(*args, **call_kwargs)


call = instantiate
