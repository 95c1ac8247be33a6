/* vs_mobile — shared mobile-embedding core.  See vs_mobile.h.
 * Build: cc -c vs_mobile.c vs_client.c  (POSIX, no third-party deps). */

#define _POSIX_C_SOURCE 200809L
#include "vs_mobile.h"

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

void vs_buf_free(vs_buf *b) {
    if (b && b->data) {
        free(b->data);
        b->data = NULL;
        b->len = 0;
    }
}

static const char B64[] =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";

char *vs_b64_encode(const unsigned char *data, long len) {
    long out_len = 4 * ((len + 2) / 3);
    char *out = malloc(out_len + 1);
    if (!out)
        return NULL;
    char *p = out;
    long i = 0;
    while (i + 2 < len) {
        unsigned v = (data[i] << 16) | (data[i + 1] << 8) | data[i + 2];
        *p++ = B64[(v >> 18) & 63];
        *p++ = B64[(v >> 12) & 63];
        *p++ = B64[(v >> 6) & 63];
        *p++ = B64[v & 63];
        i += 3;
    }
    if (i < len) {
        unsigned v = data[i] << 16;
        int two = (i + 1 < len);
        if (two)
            v |= data[i + 1] << 8;
        *p++ = B64[(v >> 18) & 63];
        *p++ = B64[(v >> 12) & 63];
        *p++ = two ? B64[(v >> 6) & 63] : '=';
        *p++ = '=';
    }
    *p = 0;
    return out;
}

/* ---- growable string for JSON request bodies --------------------------- */

typedef struct {
    char *s;
    size_t len, cap;
} sbuf;

static int sb_put(sbuf *b, const char *s) {
    size_t n = strlen(s);
    if (b->len + n + 1 > b->cap) {
        size_t cap = b->cap ? b->cap : 256;
        while (cap < b->len + n + 1)
            cap *= 2;
        char *ns = realloc(b->s, cap);
        if (!ns)
            return -1;
        b->s = ns;
        b->cap = cap;
    }
    memcpy(b->s + b->len, s, n + 1);
    b->len += n;
    return 0;
}

static int sb_putf(sbuf *b, const char *fmt, long v) {
    char tmp[32];
    snprintf(tmp, sizeof tmp, fmt, v);
    return sb_put(b, tmp);
}

/* append `"key": {"b64": "<encoded blob>"}` */
static int sb_blob(sbuf *b, const char *key, const vs_buf *blob) {
    char *enc = vs_b64_encode(blob->data, blob->len);
    if (!enc)
        return -1;
    int rc = 0;
    rc |= sb_put(b, "\"");
    rc |= sb_put(b, key);
    rc |= sb_put(b, "\": {\"b64\": \"");
    rc |= sb_put(b, enc);
    rc |= sb_put(b, "\"}");
    free(enc);
    return rc;
}

/* ---- service client singleton ----------------------------------------- */

static vs_client *g_client;

vs_client *vs_mobile_client(void) {
    if (!g_client) {
        char *py = getenv("VS_PYTHON");
        char *argv[] = {py ? py : "python3", "-m",
                        "vote_saver_tpu.frontends.service", NULL};
        g_client = vs_client_start(argv);
    }
    return g_client;
}

/* fetch the `{"b64": ...}` field `key` from `resp` into a decoded vs_buf */
static int take_blob(const char *resp, const char *key, vs_buf *out) {
    char *b64 = vs_response_b64(resp, key);
    if (!b64)
        return -1;
    long n = vs_b64_decode(b64, &out->data);
    free(b64);
    if (n < 0)
        return -1;
    out->len = n;
    return 0;
}

/* ---- the three mobile calls -------------------------------------------- */

int vs_mobile_generate_keypair(vs_buf *pk_out, vs_buf *sk_out) {
    vs_client *c = vs_mobile_client();
    if (!c)
        return 1;
    char *resp = vs_client_call(c, "generate_voter_keypair", NULL);
    if (!resp)
        return 2;
    int rc = take_blob(resp, "public_key", pk_out) ||
             take_blob(resp, "secret_key", sk_out);
    free(resp);
    return rc ? 3 : 0;
}

int vs_mobile_generate_vote(
    int tree_depth, int eid_bits, int voter_idx, int vote,
    const vs_buf *merkle_tree, const vs_buf *rt, const vs_buf *eid,
    const vs_buf *sk, const vs_buf *pk_eid,
    const vs_buf *proving_key, const vs_buf *verification_key,
    vs_buf *proof_out, vs_buf *pinput_out, vs_buf *ct_out, vs_buf *sn_out) {
    vs_client *c = vs_mobile_client();
    if (!c)
        return 1;
    sbuf b = {0};
    int rc = 0;
    rc |= sb_put(&b, "{");
    rc |= sb_putf(&b, "\"tree_depth\": %ld, ", tree_depth);
    rc |= sb_putf(&b, "\"eid_bits\": %ld, ", eid_bits);
    rc |= sb_putf(&b, "\"voter_idx\": %ld, ", voter_idx);
    rc |= sb_putf(&b, "\"vote\": %ld, ", vote);
    rc |= sb_put(&b, "\"keys\": {");
    rc |= sb_blob(&b, "r1cs_proving_key", proving_key);
    rc |= sb_put(&b, ", ");
    rc |= sb_blob(&b, "r1cs_verification_key", verification_key);
    rc |= sb_put(&b, ", ");
    rc |= sb_blob(&b, "public_key", pk_eid);
    rc |= sb_put(&b, "}, \"election\": {");
    rc |= sb_blob(&b, "eid", eid);
    rc |= sb_put(&b, ", ");
    rc |= sb_blob(&b, "rt", rt);
    rc |= sb_put(&b, ", ");
    rc |= sb_blob(&b, "merkle_tree", merkle_tree);
    rc |= sb_put(&b, "}, ");
    rc |= sb_blob(&b, "secret_key", sk);
    rc |= sb_put(&b, "}");
    if (rc) {
        free(b.s);
        return 2;
    }
    char *resp = vs_client_call(c, "generate_vote", b.s);
    free(b.s);
    if (!resp)
        return 3;
    rc = take_blob(resp, "proof", proof_out) ||
         take_blob(resp, "primary_input", pinput_out) ||
         take_blob(resp, "ct", ct_out) || take_blob(resp, "sn", sn_out);
    if (rc)
        fprintf(stderr, "vs_mobile: bad generate_vote response: %.300s\n", resp);
    free(resp);
    return rc ? 4 : 0;
}

int vs_mobile_verify_tally(
    int tree_depth, const vs_buf *cts, int n_cts,
    const vs_buf *vk_eid, const vs_buf *pk_crs, const vs_buf *vk_crs,
    const vs_buf *dec_proof, const vs_buf *voting_res, int *ok_out) {
    vs_client *c = vs_mobile_client();
    if (!c)
        return 1;
    sbuf b = {0};
    int rc = 0;
    rc |= sb_put(&b, "{");
    rc |= sb_putf(&b, "\"tree_depth\": %ld, ", tree_depth);
    rc |= sb_put(&b, "\"keys\": {");
    /* dummy r1cs pk slot is not accepted by the service: all three real
     * verification inputs are required (vk_eid, pk_crs, vk_crs) */
    rc |= sb_blob(&b, "r1cs_proving_key", pk_crs);
    rc |= sb_put(&b, ", ");
    rc |= sb_blob(&b, "r1cs_verification_key", vk_crs);
    rc |= sb_put(&b, ", ");
    rc |= sb_blob(&b, "verification_key", vk_eid);
    rc |= sb_put(&b, "}, \"cts\": [");
    for (int i = 0; i < n_cts; i++) {
        char *enc = vs_b64_encode(cts[i].data, cts[i].len);
        if (!enc) {
            rc = -1;
            break;
        }
        if (i)
            rc |= sb_put(&b, ", ");
        rc |= sb_put(&b, "{\"b64\": \"");
        rc |= sb_put(&b, enc);
        rc |= sb_put(&b, "\"}");
        free(enc);
    }
    rc |= sb_put(&b, "], ");
    rc |= sb_blob(&b, "voting_res", voting_res);
    rc |= sb_put(&b, ", ");
    rc |= sb_blob(&b, "dec_proof", dec_proof);
    rc |= sb_put(&b, "}");
    if (rc) {
        free(b.s);
        return 2;
    }
    char *resp = vs_client_call(c, "verify_tally", b.s);
    free(b.s);
    if (!resp)
        return 3;
    const char *res = strstr(resp, "\"result\"");
    *ok_out = res && strstr(res, "\"ok\": true") != NULL;
    free(resp);
    return 0;
}
