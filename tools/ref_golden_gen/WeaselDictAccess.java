// Generator-side accessor for WEASEL.Dictionary's package-private maps
// (original harness code — lives in the reference's package only to read
// the insertion-order id assignments so goldens can be emitted under
// CONTENT keys instead of ids).
package sfa.transformation;

public class WeaselDictAccess {
    /** (long key, id) pairs of the unigram/bigram dictionary. */
    public static long[][] entries(WEASEL.Dictionary d) {
        return d.dict.entries();
    }

    /** (old id, new id) pairs of the post-chi remap dictionary. */
    public static int[][] chiEntries(WEASEL.Dictionary d) {
        return d.dictChi.entries();
    }
}
