/* Demo embedder: a plain C program (no Python in-process) driving the
 * vote-saver-tpu service through libvs_client — the analog of the
 * reference's share/wasm/test.js first step against wrapper.js.
 *
 * Build: cc -o demo_client demo_client.c vs_client.c
 * Run:   ./demo_client [python-interpreter]
 */
#include "vs_client.h"

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

int main(int argc, char **argv) {
    char *py = argc > 1 ? argv[1] : "python3";
    char *child_argv[] = {py, "-m", "vote_saver_tpu.frontends.service", NULL};
    vs_client *c = vs_client_start(child_argv);
    if (!c) {
        fprintf(stderr, "failed to start service\n");
        return 1;
    }

    /* seeded voter keypair: pk = Pedersen(sk) (reference common.hpp:824-847) */
    char *resp = vs_client_call(c, "generate_voter_keypair", "{\"seed\": 7}");
    if (!resp) {
        fprintf(stderr, "call failed\n");
        return 1;
    }
    char *pk_b64 = vs_response_b64(resp, "public_key");
    char *sk_b64 = vs_response_b64(resp, "secret_key");
    if (!pk_b64 || !sk_b64) {
        fprintf(stderr, "bad response: %s\n", resp);
        return 1;
    }
    unsigned char *pk, *sk;
    long pk_len = vs_b64_decode(pk_b64, &pk);
    long sk_len = vs_b64_decode(sk_b64, &sk);
    printf("voter keypair: pk %ld bytes, sk %ld bytes\n", pk_len, sk_len);
    /* bit-array blobs: ceil(255/8) = 32 bytes each (docs/WIRE_FORMATS.md) */
    if (pk_len != 32 || sk_len != 32) {
        fprintf(stderr, "unexpected blob sizes\n");
        return 1;
    }

    /* determinism check: same seed -> same keypair */
    char *resp2 = vs_client_call(c, "generate_voter_keypair", "{\"seed\": 7}");
    char *pk2_b64 = vs_response_b64(resp2, "public_key");
    if (!pk2_b64 || strcmp(pk_b64, pk2_b64) != 0) {
        fprintf(stderr, "seeded keypair not deterministic\n");
        return 1;
    }

    free(pk);
    free(sk);
    free(pk_b64);
    free(sk_b64);
    free(pk2_b64);
    free(resp);
    free(resp2);
    vs_client_stop(c);
    printf("DEMO-OK\n");
    return 0;
}
