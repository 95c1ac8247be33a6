/* vs_mobile — shared mobile-embedding core over the vs_client transport.
 *
 * The reference ships three mobile entry points twice: JNI
 * (bin/cli/src/android.cpp:75-130, Java_com_devote_DeVoteJNI_*) and ObjC
 * (bin/cli/src/ios.mm:23-100, devote_*), each marshalling platform byte
 * buffers into the same three phase calls (init_voter, vote, tally_voter).
 * This file is the framework's platform-independent middle layer: plain C
 * buffer structs in, plain C buffer structs out, with all JSON/base64
 * marshalling to the service (frontends/service.py) handled here — so the
 * JNI shim (vs_android.c) and the ObjC shim (vs_ios.m) are each a few
 * lines of byte-copying.
 *
 * All functions return 0 on success, nonzero on failure.  Output buffers
 * are malloc'd; free with vs_buf_free.
 */
#ifndef VS_MOBILE_H
#define VS_MOBILE_H

#include "vs_client.h"

#ifdef __cplusplus
extern "C" {
#endif

typedef struct {
    unsigned char *data;
    long len;
} vs_buf;

void vs_buf_free(vs_buf *b);

/* Base64-encode `len` bytes; returns a malloc'd NUL-terminated string. */
char *vs_b64_encode(const unsigned char *data, long len);

/* The process-wide service client used by the mobile shims: started on
 * first use with {python, "-m", "vote_saver_tpu.frontends.service"}, where
 * `python` is $VS_PYTHON or "python3".  Mirrors the reference mobile
 * bridges' implicit library-global runtime. */
vs_client *vs_mobile_client(void);

/* init_voter phase: fresh Pedersen keypair (reference android.cpp:75-85). */
int vs_mobile_generate_keypair(vs_buf *pk_out, vs_buf *sk_out);

/* vote phase: full prover run (reference android.cpp:87-113).  Outputs are
 * the four ballot sections (proof / primary input / ciphertext / sn). */
int vs_mobile_generate_vote(
    int tree_depth, int eid_bits, int voter_idx, int vote,
    const vs_buf *merkle_tree, const vs_buf *rt, const vs_buf *eid,
    const vs_buf *sk, const vs_buf *pk_eid,
    const vs_buf *proving_key, const vs_buf *verification_key,
    vs_buf *proof_out, vs_buf *pinput_out, vs_buf *ct_out, vs_buf *sn_out);

/* tally_voter phase: verify the announced tally against all ciphertexts
 * (reference android.cpp:115-130).  *ok_out = 1 valid / 0 invalid. */
int vs_mobile_verify_tally(
    int tree_depth, const vs_buf *cts, int n_cts,
    const vs_buf *vk_eid, const vs_buf *pk_crs, const vs_buf *vk_crs,
    const vs_buf *dec_proof, const vs_buf *voting_res, int *ok_out);

#ifdef __cplusplus
}
#endif

#endif /* VS_MOBILE_H */
