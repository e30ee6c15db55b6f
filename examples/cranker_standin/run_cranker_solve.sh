#!/bin/sh
# Stand-in for run_cranker_solve.sh: stage-1 intermediate ($1) -> stage-2
# intermediate ($2). A real deployment points binary_dir at the MATLAB
# MCR launchers instead; the chain wiring is identical.
awk -F'\t' '{print $1 "\t" $2 "\t" ($2 % 7 == 0 ? "match" : "nomatch")}' "$1" > "$2"
