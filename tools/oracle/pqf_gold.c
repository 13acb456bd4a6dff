// dump PQF analysis bands for a chirp (golden data generator)
#include <stdio.h>
#include <math.h>
#include <string.h>
#include "atrac/atrac3plus_pqf/atrac3plus_pqf.h"
int main() {
    enum { N = 2048 * 4 };
    static float x[N], bands[N];
    for (int i = 0; i < N; i++) {
        float t = i;
        x[i] = sinf((t + t * t * 0.5f / 2.0f) * 2.0f * M_PI / (float)N);
    }
    at3plus_pqf_a_ctx_t ctx = at3plus_pqf_create_a_ctx();
    FILE* f = fopen("pqf_gold_bands.dat", "wb");
    for (int i = 0; i < N; i += 2048) {
        at3plus_pqf_do_analyse(ctx, &x[i], &bands[i]);
        fwrite(&bands[i], sizeof(float), 2048, f);
    }
    fclose(f);
    f = fopen("pqf_gold_in.dat", "wb");
    fwrite(x, sizeof(float), N, f);
    fclose(f);
    return 0;
}
