/* vs_ios — ObjC bridge over vs_mobile.  See devote_ios.h for the surface
 * (reference parity: bin/cli/src/ios.mm:23-100).  All marshalling beyond
 * NSData <-> vs_buf byte copies lives in vs_mobile.c, which the smoke test
 * (tests/test_mobile_client.py) drives directly on non-Apple rigs; this
 * file only compiles where Foundation exists. */

#import "devote_ios.h"

#include <stdlib.h>

#include "vs_mobile.h"

static vs_buf from_nsdata(const NSData *d) {
    vs_buf b;
    b.len = (long)d.length;
    b.data = malloc(b.len ? b.len : 1);
    memcpy(b.data, d.bytes, b.len);
    return b;
}

static void append_to_nsdata(const vs_buf *b, NSMutableData *out) {
    [out appendBytes:b->data length:(NSUInteger)b->len];
}

void devote_generate_keypair(NSMutableData *pk_out, NSMutableData *sk_out) {
    vs_buf pk = {0}, sk = {0};
    if (vs_mobile_generate_keypair(&pk, &sk) != 0)
        abort();
    append_to_nsdata(&pk, pk_out);
    append_to_nsdata(&sk, sk_out);
    vs_buf_free(&pk);
    vs_buf_free(&sk);
}

void devote_generate_vote(
    size_t tree_depth, size_t voter_idx, size_t vote,
    const NSData *merkle_tree, const NSData *rt, const NSData *eid,
    const NSData *sk, const NSData *pk_eid, const NSData *proving_key,
    const NSData *verification_key, NSMutableData *proof_out,
    NSMutableData *pinput_out, NSMutableData *ct_out, NSMutableData *sn_out) {
    const size_t eid_bits = 64; /* reference ios.mm:60 pins 64-bit eids */
    vs_buf tree_b = from_nsdata(merkle_tree), rt_b = from_nsdata(rt);
    vs_buf eid_b = from_nsdata(eid), sk_b = from_nsdata(sk);
    vs_buf pk_eid_b = from_nsdata(pk_eid);
    vs_buf pk_crs_b = from_nsdata(proving_key);
    vs_buf vk_crs_b = from_nsdata(verification_key);
    vs_buf proof = {0}, pinput = {0}, ct = {0}, sn = {0};
    int rc = vs_mobile_generate_vote(
        (int)tree_depth, (int)eid_bits, (int)voter_idx, (int)vote, &tree_b,
        &rt_b, &eid_b, &sk_b, &pk_eid_b, &pk_crs_b, &vk_crs_b, &proof,
        &pinput, &ct, &sn);
    vs_buf_free(&tree_b);
    vs_buf_free(&rt_b);
    vs_buf_free(&eid_b);
    vs_buf_free(&sk_b);
    vs_buf_free(&pk_eid_b);
    vs_buf_free(&pk_crs_b);
    vs_buf_free(&vk_crs_b);
    if (rc != 0)
        abort();
    append_to_nsdata(&proof, proof_out);
    append_to_nsdata(&pinput, pinput_out);
    append_to_nsdata(&ct, ct_out);
    append_to_nsdata(&sn, sn_out);
    vs_buf_free(&proof);
    vs_buf_free(&pinput);
    vs_buf_free(&ct);
    vs_buf_free(&sn);
}

bool devote_verify_tally(
    size_t tree_depth, const NSArray<NSData *> *cts, const NSData *vk_eid,
    const NSData *pk_crs, const NSData *vk_crs, const NSData *voting_res,
    const NSData *dec_proof) {
    int n = (int)cts.count;
    vs_buf *ct_bufs = calloc(n ? n : 1, sizeof(vs_buf));
    for (int i = 0; i < n; i++)
        ct_bufs[i] = from_nsdata(cts[i]);
    vs_buf vk_eid_b = from_nsdata(vk_eid), pk_crs_b = from_nsdata(pk_crs);
    vs_buf vk_crs_b = from_nsdata(vk_crs);
    vs_buf res_b = from_nsdata(voting_res), dp_b = from_nsdata(dec_proof);
    int ok = 0;
    int rc = vs_mobile_verify_tally((int)tree_depth, ct_bufs, n, &vk_eid_b,
                                    &pk_crs_b, &vk_crs_b, &dp_b, &res_b, &ok);
    for (int i = 0; i < n; i++)
        vs_buf_free(&ct_bufs[i]);
    free(ct_bufs);
    vs_buf_free(&vk_eid_b);
    vs_buf_free(&pk_crs_b);
    vs_buf_free(&vk_crs_b);
    vs_buf_free(&res_b);
    vs_buf_free(&dp_b);
    if (rc != 0)
        abort();
    return ok != 0;
}
