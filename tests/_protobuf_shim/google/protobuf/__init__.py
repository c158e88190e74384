"""Proxy onto the host's only protobuf runtime (see ../../README.md).

The Cloud SDK ships protobuf 4.23.2 rewritten into the ``cloudsdk.google
.protobuf`` namespace (its internal imports are absolute against that
name), so serving its FILES under ``google.protobuf`` would load every
module twice — two descriptor pools, two symbol databases, and gencode
registering types the runtime half never sees. Instead this package
installs a meta-path redirect: any ``google.protobuf.X`` import is
answered with the ALREADY-IMPORTED ``cloudsdk.google.protobuf.X``
module object itself — one instance, two names. The only module served
from this directory is ``runtime_version`` (absent in 4.23; a stub —
see its docstring for the support-matrix caveat)."""

import importlib
import importlib.abc
import importlib.machinery
import os
import sys

_THIRD_PARTY = "/usr/lib/google-cloud-sdk/lib/third_party"
if not os.path.isdir(f"{_THIRD_PARTY}/cloudsdk/google/protobuf"):
    raise ImportError(
        "protobuf proxy: host runtime not found under "
        f"{_THIRD_PARTY} — install a real google.protobuf instead"
    )
if _THIRD_PARTY not in sys.path:
    sys.path.append(_THIRD_PARTY)  # append: never shadow real packages


class _Redirect(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    _PREFIX = "google.protobuf."
    _TARGET = "cloudsdk.google.protobuf."
    _OWN = {"google.protobuf.runtime_version"}  # served from this dir

    def find_spec(self, name, path=None, target=None):
        if name.startswith(self._PREFIX) and name not in self._OWN:
            return importlib.machinery.ModuleSpec(name, self)
        return None

    def create_module(self, spec):
        return importlib.import_module(
            self._TARGET + spec.name[len(self._PREFIX) :]
        )

    def exec_module(self, module):  # module IS the impl instance: no-op
        pass


if not any(isinstance(f, _Redirect) for f in sys.meta_path):
    sys.meta_path.insert(0, _Redirect())

__version__ = "4.23.2+cloudsdk-proxy"
