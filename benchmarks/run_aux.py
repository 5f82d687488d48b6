#!/usr/bin/env python3
"""Run the small TPU benches in ONE process (relay grants are per-process
and cost 5-15 min each): vpu_peak, latency, scaling.

Usage: python benchmarks/run_aux.py [part ...]   (default: all three)
Each part still prints its own JSON lines; a part failure doesn't kill the
rest (it prints a {"part": ..., "error": ...} line instead).
"""

import pathlib
import runpy
import sys
import traceback

HERE = pathlib.Path(__file__).resolve().parent


def main():
    parts = sys.argv[1:] or ["vpu_peak", "latency", "scaling"]
    for part in parts:
        print(f'{{"part": "{part}"}}', flush=True)
        argv = sys.argv
        sys.argv = [f"bench_{part}.py"]
        try:
            runpy.run_path(str(HERE / f"bench_{part}.py"),
                           run_name="__main__")
        except SystemExit as e:
            if e.code:
                print(f'{{"part": "{part}", "exit": "{e.code}"}}',
                      flush=True)
        except Exception:
            err = traceback.format_exc().splitlines()[-1][:160]
            print(f'{{"part": "{part}", "error": {err!r}}}', flush=True)
        finally:
            sys.argv = argv


if __name__ == "__main__":
    main()
