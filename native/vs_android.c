/* vs_android — JNI bridge over vs_mobile: the framework's analog of the
 * reference's Android embedding (bin/cli/src/android.cpp:75-130).  Exports
 * the same three Java-visible entry points under the same JNI names
 * (Java_com_devote_DeVoteJNI_*) so a DeVote-style app's Java side loads
 * either library unchanged; the native side talks to the TPU-host service
 * through vs_client instead of running crypto3 in-process.
 *
 * Buffer contract (same as the reference): callers allocate output
 * jbyteArrays at the exact blob sizes (the wire formats are fixed per
 * docs/WIRE_FORMATS.md); a size mismatch aborts.
 *
 * Build (NDK): compile with the NDK's <jni.h> on the include path:
 *   cc -shared -fPIC -o libdevote.so vs_android.c vs_mobile.c vs_client.c
 * The in-repo jni_compat/jni.h is a TEST-ONLY stand-in for rigs without an
 * NDK (see its header comment); tests/test_mobile_client.py uses it.
 */
#include <jni.h>

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "vs_mobile.h"

static int write_to_buffer(JNIEnv *env, const vs_buf *blob, jbyteArray out) {
    jsize cap = (*env)->GetArrayLength(env, out);
    if ((long)cap != blob->len) {
        fprintf(stderr, "vs_android: buffer size %ld != blob size %ld\n",
                (long)cap, blob->len);
        abort();
    }
    jbyte *p = (*env)->GetByteArrayElements(env, out, NULL);
    memcpy(p, blob->data, blob->len);
    (*env)->ReleaseByteArrayElements(env, out, p, 0);
    return 0;
}

static vs_buf read_buffer(JNIEnv *env, jbyteArray in) {
    vs_buf b;
    b.len = (*env)->GetArrayLength(env, in);
    b.data = malloc(b.len ? b.len : 1);
    jbyte *p = (*env)->GetByteArrayElements(env, in, NULL);
    memcpy(b.data, p, b.len);
    (*env)->ReleaseByteArrayElements(env, in, p, JNI_ABORT);
    return b;
}

JNIEXPORT void JNICALL Java_com_devote_DeVoteJNI_generateVoterKeypair(
    JNIEnv *env, jobject thiz, jbyteArray pk_out, jbyteArray sk_out) {
    (void)thiz;
    vs_buf pk = {0}, sk = {0};
    if (vs_mobile_generate_keypair(&pk, &sk) != 0)
        abort();
    write_to_buffer(env, &pk, pk_out);
    write_to_buffer(env, &sk, sk_out);
    vs_buf_free(&pk);
    vs_buf_free(&sk);
}

JNIEXPORT void JNICALL Java_com_devote_DeVoteJNI_generateVote(
    JNIEnv *env, jobject thiz, jint tree_depth, jint eid_bits,
    jint voter_idx, jint vote, jbyteArray merkle_tree_buffer,
    jbyteArray rt_buffer, jbyteArray eid_buffer, jbyteArray sk_buffer,
    jbyteArray pk_eid_buffer, jbyteArray r1cs_proving_key_buffer,
    jbyteArray r1cs_verification_key_buffer, jbyteArray proof_buffer_out,
    jbyteArray pinput_buffer_out, jbyteArray ct_buffer_out,
    jbyteArray sn_buffer_out) {
    (void)thiz;
    vs_buf tree = read_buffer(env, merkle_tree_buffer);
    vs_buf rt = read_buffer(env, rt_buffer);
    vs_buf eid = read_buffer(env, eid_buffer);
    vs_buf sk = read_buffer(env, sk_buffer);
    vs_buf pk_eid = read_buffer(env, pk_eid_buffer);
    vs_buf pk_crs = read_buffer(env, r1cs_proving_key_buffer);
    vs_buf vk_crs = read_buffer(env, r1cs_verification_key_buffer);
    vs_buf proof = {0}, pinput = {0}, ct = {0}, sn = {0};
    int rc = vs_mobile_generate_vote(
        tree_depth, eid_bits, voter_idx, vote, &tree, &rt, &eid, &sk,
        &pk_eid, &pk_crs, &vk_crs, &proof, &pinput, &ct, &sn);
    vs_buf_free(&tree);
    vs_buf_free(&rt);
    vs_buf_free(&eid);
    vs_buf_free(&sk);
    vs_buf_free(&pk_eid);
    vs_buf_free(&pk_crs);
    vs_buf_free(&vk_crs);
    if (rc != 0)
        abort();
    write_to_buffer(env, &proof, proof_buffer_out);
    write_to_buffer(env, &pinput, pinput_buffer_out);
    write_to_buffer(env, &ct, ct_buffer_out);
    write_to_buffer(env, &sn, sn_buffer_out);
    vs_buf_free(&proof);
    vs_buf_free(&pinput);
    vs_buf_free(&ct);
    vs_buf_free(&sn);
}

JNIEXPORT jboolean JNICALL Java_com_devote_DeVoteJNI_verifyTally(
    JNIEnv *env, jobject thiz, jint tree_depth, jobjectArray cts_buffer_array,
    jbyteArray vk_eid_buffer, jbyteArray pk_crs_buffer,
    jbyteArray vk_crs_buffer, jbyteArray dec_proof_buffer,
    jbyteArray voting_res_buffer) {
    (void)thiz;
    jsize n = (*env)->GetArrayLength(env, cts_buffer_array);
    vs_buf *cts = calloc(n ? n : 1, sizeof(vs_buf));
    for (jsize i = 0; i < n; i++) {
        jobject o = (*env)->GetObjectArrayElement(env, cts_buffer_array, i);
        cts[i] = read_buffer(env, (jbyteArray)o);
    }
    vs_buf vk_eid = read_buffer(env, vk_eid_buffer);
    vs_buf pk_crs = read_buffer(env, pk_crs_buffer);
    vs_buf vk_crs = read_buffer(env, vk_crs_buffer);
    vs_buf dec_proof = read_buffer(env, dec_proof_buffer);
    vs_buf voting_res = read_buffer(env, voting_res_buffer);
    int ok = 0;
    int rc = vs_mobile_verify_tally(tree_depth, cts, n, &vk_eid, &pk_crs,
                                    &vk_crs, &dec_proof, &voting_res, &ok);
    for (jsize i = 0; i < n; i++)
        vs_buf_free(&cts[i]);
    free(cts);
    vs_buf_free(&vk_eid);
    vs_buf_free(&pk_crs);
    vs_buf_free(&vk_crs);
    vs_buf_free(&dec_proof);
    vs_buf_free(&voting_res);
    if (rc != 0)
        abort();
    return ok ? JNI_TRUE : JNI_FALSE;
}
