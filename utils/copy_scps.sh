#!/bin/bash
# Materialize an scp's files into one directory with uid-based names and
# write a sibling *_relative.scp (reference utils/copy_scps.sh).
set -eu
input_scp=$1
output_dir=$2
mkdir -p "$output_dir"
output_scp="${input_scp%.*}_relative.scp"
> "$output_scp"
while IFS=" " read -r uid rate path || [ -n "${path:-}" ]; do
    filename=$(basename "$path")
    extension="${filename##*.}"
    new_file="${uid}.${extension}"
    cp "$path" "${output_dir}/${new_file}"
    echo "${uid} ${rate} ${output_dir}/${new_file}" >> "$output_scp"
done < "$input_scp"
echo "Done. New scp: $output_scp"
