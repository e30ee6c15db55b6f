#!/bin/sh
# Stand-in for run_cranker_read.sh (reference properties.json:10): parse
# the staged headered TSV ($1) into the stage-1 intermediate ($2).
# Fails loudly if the header is missing -- the DATA_HEADER contract.
head -n1 "$1" | grep -q "^peptide_id" || { echo "missing header" >&2; exit 4; }
awk -F'\t' 'NR==1{next} {print $1 "\t" length($2)}' "$1" > "$2"
