#!/bin/sh
# Build the Python wheel — counterpart of the reference's pyvbz wheel build
# (reference: python/pyvbz/build_pyvbz.cmake:8-20, setup.py bdist_wheel).
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
REPO=$(dirname "$HERE")
cd "$REPO"
python -m pip wheel --no-deps --no-build-isolation -w "$HERE/dist" . \
  || python setup.py bdist_wheel -d "$HERE/dist" 2>/dev/null \
  || python -m build --wheel --no-isolation -o "$HERE/dist"
ls -l "$HERE/dist"
