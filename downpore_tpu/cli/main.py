"""Entry point: ``python -m downpore_tpu.cli <command> [-flag value ...]``
with the same commands, flags and help output shape as the reference binary
(ref: downpore.go:53-92)."""
from __future__ import annotations

import os
import sys

from .framework import aligned_print, parse_argv


def _apply_backend_env():
    """Honor JAX_PLATFORMS / DOWNPORE_BACKEND for the CLI, and turn on
    the persistent compilation cache.

    Site configuration in some images registers a remote TPU platform via
    ``jax.config`` at interpreter start, which beats the JAX_PLATFORMS env
    var and can stall CLI startup for minutes when the device link is
    busy.  Users asking for a backend explicitly get it.

    The persistent cache makes every CLI invocation after the first skip
    the multi-second XLA compiles of the fused kernels (verified to hit
    across processes on TPU backends); DOWNPORE_CACHE_DIR overrides the
    location, an empty value disables it."""
    import jax
    want = os.environ.get("DOWNPORE_BACKEND") or \
        os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)
    cache = os.environ.get("DOWNPORE_CACHE_DIR",
                           os.path.expanduser("~/.cache/downpore_tpu/jax"))
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


_apply_backend_env()


def get_commands():
    from .trim_command import TrimCommand
    coms = [TrimCommand()]
    try:
        from .map_command import MapCommand
        coms.append(MapCommand())
    except ImportError:
        pass
    try:
        from .overlap_command import OverlapCommand
        coms.append(OverlapCommand())
    except ImportError:
        pass
    try:
        from .subseq_command import SubSeqCommand
        coms.append(SubSeqCommand())
    except ImportError:
        pass
    try:
        from .consensus_command import ConsensusCommand, AlignCommand
        coms.append(ConsensusCommand())
        coms.append(AlignCommand())
    except ImportError:
        pass
    try:
        from .correct_command import CorrectCommand
        coms.append(CorrectCommand())
    except ImportError:
        pass
    try:
        from .kmers_command import KmersCommand
        coms.append(KmersCommand())
    except ImportError:
        pass
    try:
        from .version_command import VersionCommand
        coms.append(VersionCommand())
    except ImportError:
        pass
    return coms


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    coms = get_commands()
    if not argv:
        print("Available commands:\n help <command> "
              "Describe the command and its arguments")
        for com in coms:
            print(" " + com.name)
        return 0
    if argv[0] == "help":
        if len(argv) > 1:
            for com in coms:
                if com.name == argv[1]:
                    lines = []
                    for arg, default in com.args.items():
                        a = com.alias.get(arg)
                        lines.append(["-" + arg, "-" + a if a else "",
                                      com.desc[arg],
                                      "(default:" + default + ")"])
                    aligned_print(lines)
                    return 0
        print("Usage: downpore help <command>\n"
              "To see a list of available commands just run downpore")
        return 0
    for com in coms:
        if com.name == argv[0]:
            com.run(parse_argv(com, argv[1:]))
            return 0
    print("Available commands:\n help <command> "
          "Describe the command and its arguments")
    return 0


if __name__ == "__main__":
    sys.exit(main())
