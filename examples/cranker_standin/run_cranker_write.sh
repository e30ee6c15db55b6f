#!/bin/sh
# Stand-in for run_cranker_write.sh: needs BOTH intermediates ($1, $2)
# like the reference (shared %TMP_FILE_N% memoization), writes the final
# output ($3). MCR_CACHE_ROOT must be injected (ExecutorMapper.java:174-177).
[ -n "$MCR_CACHE_ROOT" ] || { echo "MCR_CACHE_ROOT not set" >&2; exit 3; }
cp "$2" "$3"
