/* TEST-ONLY stand-in for <jni.h> — NOT the Android NDK header.
 *
 * Purpose: this rig has no Android NDK, but vs_android.c must be compiled
 * and DRIVEN by tests/test_mobile_client.py.  This header declares just the
 * JNI surface vs_android.c uses, with the standard C calling convention
 * ((*env)->Fn(env, ...) through a function-pointer table), so the SAME
 * vs_android.c source compiles against either header.
 *
 * The function-table LAYOUT here is not the JVM's (the real
 * JNINativeInterface has ~230 ordered slots); a library built against this
 * header works only with the fake env the smoke test constructs.  Real
 * builds MUST use the NDK's <jni.h> (see vs_android.c's build note).
 */
#ifndef VS_JNI_COMPAT_H
#define VS_JNI_COMPAT_H

#include <stdint.h>

typedef int32_t jint;
typedef int64_t jlong;
typedef int8_t jbyte;
typedef uint8_t jboolean;
typedef jint jsize;

typedef void *jobject;
typedef jobject jclass;
typedef jobject jarray;
typedef jarray jbyteArray;
typedef jarray jobjectArray;

#define JNI_TRUE 1
#define JNI_FALSE 0
#define JNI_ABORT 2

#define JNIEXPORT __attribute__((visibility("default")))
#define JNICALL

struct JNINativeInterface_;
typedef const struct JNINativeInterface_ *JNIEnv;

struct JNINativeInterface_ {
    jsize (*GetArrayLength)(JNIEnv *env, jarray array);
    jbyte *(*GetByteArrayElements)(JNIEnv *env, jbyteArray array,
                                   jboolean *is_copy);
    void (*ReleaseByteArrayElements)(JNIEnv *env, jbyteArray array,
                                     jbyte *elems, jint mode);
    jobject (*GetObjectArrayElement)(JNIEnv *env, jobjectArray array,
                                     jsize index);
};

#endif /* VS_JNI_COMPAT_H */
