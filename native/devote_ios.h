/* devote_ios — ObjC embedding surface over vs_mobile: the framework's
 * analog of the reference's iOS bridge (bin/cli/src/ios.mm:23-100 +
 * devote_ios.h).  Same three entry points under the same names, NSData in /
 * NSMutableData out (results are APPENDED, matching the reference's
 * write_vector_to_NSData contract); the native side talks to the TPU-host
 * service through vs_client.
 *
 * Build (Xcode): add vs_ios.m, vs_mobile.c, vs_client.c to the target.
 */
#ifndef DEVOTE_IOS_H
#define DEVOTE_IOS_H

#import <Foundation/Foundation.h>

#ifdef __cplusplus
extern "C" {
#endif

void devote_generate_keypair(NSMutableData *pk_out, NSMutableData *sk_out);

void devote_generate_vote(
    size_t tree_depth, size_t voter_idx, size_t vote,
    const NSData *merkle_tree, const NSData *rt, const NSData *eid,
    const NSData *sk, const NSData *pk_eid, const NSData *proving_key,
    const NSData *verification_key, NSMutableData *proof_out,
    NSMutableData *pinput_out, NSMutableData *ct_out, NSMutableData *sn_out);

bool devote_verify_tally(
    size_t tree_depth, const NSArray<NSData *> *cts, const NSData *vk_eid,
    const NSData *pk_crs, const NSData *vk_crs, const NSData *voting_res,
    const NSData *dec_proof);

#ifdef __cplusplus
}
#endif

#endif /* DEVOTE_IOS_H */
