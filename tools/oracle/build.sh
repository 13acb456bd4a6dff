#!/bin/sh
# Builds the reference-implementation oracles used for golden-vector
# generation and baseline measurement.  The reference tree (read-only) is
# expected at /root/reference; kissfft is copied because its sources need
# -x c and a tools/ include dir.
set -e
R=${R:-/root/reference/src}
OUT=${OUT:-/tmp/oracle}
mkdir -p "$OUT"
cp "$R/lib/fft/kissfft_impl/kiss_fft.c" "$OUT/kiss1.c"
cp "$R/lib/fft/kissfft_impl/tools/kiss_fftr.c" "$OUT/kiss2.c"
CXXFLAGS="-O2 -std=c++17 -I$R -I$R/lib -I$R/lib/liboma/include \
 -I$R/lib/fft/kissfft_impl -I$R/lib/fft/kissfft_impl/tools \
 -Dkiss_fft_scalar=float"

# AT1 + AT3 encoder/decoder oracle (raw float I/O, all containers)
g++ $CXXFLAGS -o "$OUT/oracle" "$(dirname "$0")/oracle_main.cpp" \
  $R/aea.cpp $R/env.cpp $R/transient_detector.cpp \
  $R/transient_spectral_upsampler.cpp $R/atrac1denc.cpp \
  $R/atrac/at1/atrac1.cpp $R/atrac/at1/atrac1_bitalloc.cpp \
  $R/atrac/at1/atrac1_dequantiser.cpp $R/atrac/atrac_scale.cpp \
  $R/atrac/atrac_enc_cache.cpp $R/atrac/atrac_psy_common.cpp \
  $R/oma.cpp $R/rm.cpp $R/at3.cpp $R/raw.cpp $R/atrac3denc.cpp \
  $R/atrac/at3/atrac3.cpp $R/atrac/at3/atrac3_bitstream.cpp \
  $R/qmf/qmf.cpp $R/atrac/at3p/at3p_tables.cpp $R/lib/mdct/mdct.cpp \
  $R/lib/bs_encode/encode.cpp $R/lib/bitstream/bitstream.cpp \
  $R/lib/liboma/src/liboma.c "$OUT/kiss1.c" "$OUT/kiss2.c"

# AT3P oracle (GHA-disabled flow; the libgha submodule is absent upstream)
g++ $CXXFLAGS -o "$OUT/at3p_oracle" "$(dirname "$0")/at3p_oracle.cpp" \
  $R/atrac/at3p/at3p_bitstream.cpp $R/atrac/at3p/at3p_mdct.cpp \
  $R/atrac/at3p/at3p_tables.cpp $R/atrac/atrac_scale.cpp \
  $R/atrac/at3/atrac3.cpp $R/atrac/at1/atrac1.cpp \
  $R/lib/bs_encode/encode.cpp $R/lib/bitstream/bitstream.cpp \
  $R/lib/mdct/mdct.cpp $R/raw.cpp $R/env.cpp \
  -x c $R/atrac/atrac3plus_pqf/atrac3plus_pqf.c "$OUT/kiss1.c" "$OUT/kiss2.c"

# AT3P format-table dumper (regenerates atracdenc_tpu/models/atrac3p/format_data.npz)
g++ $CXXFLAGS -o "$OUT/dump_at3p" "$(dirname "$0")/dump_at3p_tables.cpp" \
  $R/atrac/at3p/at3p_tables.cpp $R/lib/mdct/mdct.cpp "$OUT/kiss1.c" "$OUT/kiss2.c"

# PQF analysis golden generator
g++ -x c++ $CXXFLAGS -o "$OUT/pqf_gold" "$(dirname "$0")/pqf_gold.c" \
  -x c $R/atrac/atrac3plus_pqf/atrac3plus_pqf.c "$OUT/kiss1.c" \
  -x c++ $R/lib/mdct/mdct.cpp
echo "built: $OUT/{oracle,at3p_oracle,dump_at3p,pqf_gold}"
