/* mobile_smoke — drives the three JNI entry points of vs_android.c through
 * a fake JNIEnv (built on jni_compat/jni.h's test-only function table), so
 * the full mobile embedding stack — JNI buffer marshalling -> vs_mobile
 * JSON/base64 -> vs_client pipes -> frontends/service.py — runs on a rig
 * without an Android NDK or JVM.  tests/test_mobile_client.py compiles and
 * runs this, then verifies the produced ballot with the Python SDK.
 *
 * Usage: mobile_smoke <python> <data_dir> <out_dir>
 *          <proof_len> <pinput_len> <ct_len> <sn_len> <n_cts> <do_vote>
 * data_dir holds: tree rt eid sk pk_eid pk_crs vk_crs vk_eid voting_res
 * dec_proof ct0..ct{n-1} (raw blob files). */

#define _POSIX_C_SOURCE 200809L
#include <jni.h>

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* ---- fake JNI object model -------------------------------------------- */

typedef struct {
    jsize len;
    jbyte *data;
} FakeArr;

typedef struct {
    jsize len;
    jobject *items;
} FakeObjArr;

static jsize f_GetArrayLength(JNIEnv *env, jarray a) {
    (void)env;
    return ((FakeArr *)a)->len; /* len is the first member of both kinds */
}

static jbyte *f_GetByteArrayElements(JNIEnv *env, jbyteArray a, jboolean *c) {
    (void)env;
    if (c)
        *c = 0;
    return ((FakeArr *)a)->data;
}

static void f_ReleaseByteArrayElements(JNIEnv *env, jbyteArray a, jbyte *e,
                                       jint mode) {
    (void)env;
    (void)a;
    (void)e;
    (void)mode;
}

static jobject f_GetObjectArrayElement(JNIEnv *env, jobjectArray a, jsize i) {
    (void)env;
    return ((FakeObjArr *)a)->items[i];
}

static const struct JNINativeInterface_ FAKE_TABLE = {
    f_GetArrayLength,
    f_GetByteArrayElements,
    f_ReleaseByteArrayElements,
    f_GetObjectArrayElement,
};

/* the JNI exports under test */
void Java_com_devote_DeVoteJNI_generateVoterKeypair(JNIEnv *, jobject,
                                                    jbyteArray, jbyteArray);
void Java_com_devote_DeVoteJNI_generateVote(
    JNIEnv *, jobject, jint, jint, jint, jint, jbyteArray, jbyteArray,
    jbyteArray, jbyteArray, jbyteArray, jbyteArray, jbyteArray, jbyteArray,
    jbyteArray, jbyteArray, jbyteArray);
jboolean Java_com_devote_DeVoteJNI_verifyTally(JNIEnv *, jobject, jint,
                                               jobjectArray, jbyteArray,
                                               jbyteArray, jbyteArray,
                                               jbyteArray, jbyteArray);

/* ---- file helpers ------------------------------------------------------ */

static FakeArr load(const char *dir, const char *name) {
    char path[1024];
    snprintf(path, sizeof path, "%s/%s", dir, name);
    FILE *f = fopen(path, "rb");
    if (!f) {
        fprintf(stderr, "mobile_smoke: cannot open %s\n", path);
        exit(2);
    }
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    FakeArr a = {(jsize)n, malloc(n ? n : 1)};
    if (fread(a.data, 1, n, f) != (size_t)n)
        exit(2);
    fclose(f);
    return a;
}

static void dump(const char *dir, const char *name, const FakeArr *a) {
    char path[1024];
    snprintf(path, sizeof path, "%s/%s", dir, name);
    FILE *f = fopen(path, "wb");
    if (!f || fwrite(a->data, 1, a->len, f) != (size_t)a->len)
        exit(3);
    fclose(f);
}

static FakeArr alloc_arr(long n) {
    FakeArr a = {(jsize)n, calloc(n ? n : 1, 1)};
    return a;
}

int main(int argc, char **argv) {
    if (argc < 10) {
        fprintf(stderr, "usage: see header comment\n");
        return 1;
    }
    setenv("VS_PYTHON", argv[1], 1);
    const char *data_dir = argv[2], *out_dir = argv[3];
    long proof_len = atol(argv[4]), pinput_len = atol(argv[5]);
    long ct_len = atol(argv[6]), sn_len = atol(argv[7]);
    int n_cts = atoi(argv[8]);
    int do_vote = atoi(argv[9]);

    const struct JNINativeInterface_ *table = &FAKE_TABLE;
    JNIEnv *env = &table;

    /* 1. generateVoterKeypair: 32-byte bitarray blobs (WIRE_FORMATS.md) */
    FakeArr pk = alloc_arr(32), sk_new = alloc_arr(32);
    Java_com_devote_DeVoteJNI_generateVoterKeypair(
        env, NULL, (jbyteArray)&pk, (jbyteArray)&sk_new);
    int nz = 0;
    for (int i = 0; i < 32; i++)
        nz |= pk.data[i] != 0;
    if (!nz) {
        fprintf(stderr, "keypair came back all-zero\n");
        return 4;
    }
    printf("keypair ok\n");

    /* 2. generateVote: depth-2 fixture voter 0 */
    if (do_vote) {
        FakeArr tree = load(data_dir, "tree"), rt = load(data_dir, "rt");
        FakeArr eid = load(data_dir, "eid"), sk = load(data_dir, "sk");
        FakeArr pk_eid = load(data_dir, "pk_eid");
        FakeArr pk_crs = load(data_dir, "pk_crs");
        FakeArr vk_crs = load(data_dir, "vk_crs");
        FakeArr proof = alloc_arr(proof_len), pinput = alloc_arr(pinput_len);
        FakeArr ct = alloc_arr(ct_len), sn = alloc_arr(sn_len);
        Java_com_devote_DeVoteJNI_generateVote(
            env, NULL, 2, 64, 0, 5, (jbyteArray)&tree, (jbyteArray)&rt,
            (jbyteArray)&eid, (jbyteArray)&sk, (jbyteArray)&pk_eid,
            (jbyteArray)&pk_crs, (jbyteArray)&vk_crs, (jbyteArray)&proof,
            (jbyteArray)&pinput, (jbyteArray)&ct, (jbyteArray)&sn);
        dump(out_dir, "proof", &proof);
        dump(out_dir, "pinput", &pinput);
        dump(out_dir, "ct", &ct);
        dump(out_dir, "sn", &sn);
        printf("vote ok\n");
    }

    /* 3. verifyTally over the fixture election's ciphertexts */
    FakeArr *cts = calloc(n_cts, sizeof(FakeArr));
    jobject *items = calloc(n_cts, sizeof(jobject));
    for (int i = 0; i < n_cts; i++) {
        char name[32];
        snprintf(name, sizeof name, "ct%d", i);
        cts[i] = load(data_dir, name);
        items[i] = (jobject)&cts[i];
    }
    FakeObjArr cts_arr = {(jsize)n_cts, items};
    FakeArr vk_eid = load(data_dir, "vk_eid");
    FakeArr pk_crs2 = load(data_dir, "pk_crs");
    FakeArr vk_crs2 = load(data_dir, "vk_crs");
    FakeArr dec_proof = load(data_dir, "dec_proof");
    FakeArr voting_res = load(data_dir, "voting_res");
    jboolean ok = Java_com_devote_DeVoteJNI_verifyTally(
        env, NULL, 2, (jobjectArray)&cts_arr, (jbyteArray)&vk_eid,
        (jbyteArray)&pk_crs2, (jbyteArray)&vk_crs2, (jbyteArray)&dec_proof,
        (jbyteArray)&voting_res);
    if (!ok) {
        fprintf(stderr, "verifyTally returned false on a valid tally\n");
        return 5;
    }
    printf("tally ok\nMOBILE-OK\n");
    return 0;
}
